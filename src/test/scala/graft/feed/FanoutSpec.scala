package graft.feed

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Batch feed-domain semantics — mirrors the reference's worker/server
  * tests (cmd/worker/worker_test.go, cmd/server/server_test.go) and
  * the FIXTURES.md §3 canonical micro-scenario. */
class FanoutSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
  private def users = Seq(User("u-almaz", "almaz"), User("u-nur", "nur")).toDS.toDF
  private def follows = Seq(Follow("u-almaz", "u-nur")).toDS.toDF
  private def posts = Seq(Post("p-100", "u-nur", "Hello from Nur!", t0)).toDS.toDF

  test("canonical micro-scenario: follower gets the post, author does not (F1/F4)") {
    val feed = Fanout.fanout(posts, follows)
    val rows = feed.as[FeedEntry].collect()
    assert(rows.toSeq == Seq(FeedEntry("u-almaz", "p-100", "u-nur", "Hello from Nur!", t0)))
    assert(FeedQueries.feedTopK(feed, "u-nur").isEmpty) // no self-feed
  }

  test("includeSelf flag adds exactly the author row (F4 mock divergence, explicit)") {
    val feed = Fanout.fanout(posts, follows, includeSelf = true)
    assert(feed.count() == 2)
    assert(FeedQueries.feedTopK(feed, "u-nur").count() == 1)
  }

  test("fan-out is per-follower: N followers → N rows") {
    val manyFollows = (1 to 7).map(i => Follow(s"u-$i", "u-nur")).toDS.toDF
    val feed = Fanout.fanout(posts, manyFollows)
    assert(feed.count() == 7)
    assert(feed.select("user_id").distinct().count() == 7)
  }

  test("saltedFanout matches plain fanout exactly") {
    val manyFollows = (1 to 23).map(i => Follow(s"u-$i", "u-nur")).toDS.toDF
    val plain = Fanout.fanout(posts, manyFollows)
    val salted = Fanout.saltedFanout(posts, manyFollows, salt = 4)
    assert(salted.count() == plain.count())
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }

  test("undelivered anti-join finds exactly the missing rows (F5)") {
    val manyFollows = (1 to 5).map(i => Follow(s"u-$i", "u-nur")).toDS.toDF
    val expected = Fanout.fanout(posts, manyFollows)
    val partial = expected.filter(col("user_id") =!= "u-3")
    val missing = Fanout.undelivered(expected, partial)
    assert(missing.select("user_id").as[String].collect().toSeq == Seq("u-3"))
    assert(Fanout.deliveryInvariantHolds(posts, manyFollows, expected))
    assert(!Fanout.deliveryInvariantHolds(posts, manyFollows, partial))
  }

  test("e2eFeed verification leg catches a planted fan-out bug (independent expected side)") {
    // healthy operator: zero undelivered everywhere
    val ok = graft.ops.BenchShapes.e2eFeedWith(spark,
      (p, f) => Fanout.fanout(p, f))
    assert(ok.filter(col("n_undelivered") > 0).isEmpty)
    // planted bug: fan-out silently drops every delivery to user-3 —
    // the round-5 form (expected side routed through the same
    // Fanout.fanout call) would cancel this; the raw-join expected
    // side must surface it as undelivered rows
    val buggy = graft.ops.BenchShapes.e2eFeedWith(spark,
      (p, f) => Fanout.fanout(p, f).filter(col("user_id") =!= "user-3"))
    val undeliveredTotal = buggy.agg(sum(col("n_undelivered"))).as[Long].head()
    assert(undeliveredTotal > 0, "planted row-dropping bug must be caught")
    // flag-flipped includeSelf adds self-rows: caught by the delivery
    // invariant's reverse direction (feed ⊄ expected)
    val posts3 = (1 to 3).map(i => Post(s"p-$i", "u-nur", s"b$i", t0)).toDS.toDF
    val manyFollows = (1 to 5).map(i => Follow(s"u-$i", "u-nur")).toDS.toDF
    val selfFeed = Fanout.fanout(posts3, manyFollows, includeSelf = true)
    assert(!Fanout.deliveryInvariantHolds(posts3, manyFollows, selfFeed))
  }

  test("feed top-K: newest first, limit applied, default 50, non-positive clamped (R3/R4)") {
    val feed = (1 to 60).map(i =>
      FeedEntry("u-1", f"p-$i%03d", "u-2", s"b$i",
        new Timestamp(t0.getTime + i * 1000L))).toDS.toDF
    val top10 = FeedQueries.feedTopK(feed, "u-1", 10).as[FeedEntry].collect()
    assert(top10.length == 10)
    assert(top10.head.post_id == "p-060" && top10.last.post_id == "p-051")
    assert(FeedQueries.feedTopK(feed, "u-1").count() == 50) // default
    assert(FeedQueries.feedTopK(feed, "u-1", -5).count() == 1) // clamp to 1
  }

  test("feed top-K all users form matches per-user form (R3 window)") {
    val feed = (for (u <- 1 to 3; i <- 1 to 5) yield
      FeedEntry(s"u-$u", s"p-$u-$i", "a", "b",
        new Timestamp(t0.getTime + i * 1000L))).toDS.toDF
    val all = FeedQueries.feedTopKAllUsers(feed, 2)
    assert(all.count() == 6)
    val perUser = FeedQueries.feedTopK(feed, "u-2", 2)
    assert(perUser.except(all.filter(col("user_id") === "u-2")).isEmpty)
  }

  test("R1/R2 lookups: empty on miss, projections only") {
    assert(FeedQueries.userIdByUsername(users, "almaz").as[String].collect().toSeq == Seq("u-almaz"))
    assert(FeedQueries.userIdByUsername(users, "ghost").isEmpty) // not error
    assert(FeedQueries.followers(follows, "u-nur").as[String].collect().toSeq == Seq("u-almaz"))
    assert(FeedQueries.following(follows, "u-almaz").as[String].collect().toSeq == Seq("u-nur"))
  }

  test("R6 validation predicates match the reference bounds") {
    val us = Seq(User("a", ""), User("b", "x"), User("c", "y" * 50), User("d", "z" * 51)).toDS.toDF
    assert(FeedQueries.validUsers(us).select("user_id").as[String].collect().toSet == Set("b", "c"))
    assert(FeedQueries.invalidUsers(us).count() == 2)
    val ps = Seq(
      Post("p1", "a", "", t0), Post("p2", "a", "ok", t0),
      Post("p3", "a", "w" * 1000, t0), Post("p4", "a", "w" * 1001, t0)).toDS.toDF
    assert(FeedQueries.validPosts(ps).select("post_id").as[String].collect().toSet == Set("p2", "p3"))
  }

  test("CAS username claim: first-wins in batch, existing names excluded (S6/A5)") {
    val existing = Seq(User("u-0", "taken")).toDS.toDF
    val candidates = Seq(
      User("u-9", "fresh"), User("u-3", "fresh"), // dup within batch → u-3 wins (min id)
      User("u-5", "taken")).toDS.toDF             // loses CAS vs existing
    val claimed = IdempotentSink.claimUsernames(candidates, existing)
      .select("user_id").as[String].collect().toSeq
    assert(claimed == Seq("u-3"))
  }
}
