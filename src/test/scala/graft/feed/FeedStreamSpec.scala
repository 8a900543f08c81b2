package graft.feed

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end streaming pipeline test (FIXTURES.md §3 scenario through
  * the real StreamingQuery — the no-polling mirror of the reference's
  * server_test.go:110-144 e2e, per SURVEY §5.2 item 4). */
class FeedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private val goodJson =
    """{"id":"p-100","author_id":"u-nur","body":"Hello from Nur!","created":"2026-01-01T00:00:00Z"}"""

  private def runPipeline(messages: Seq[Seq[String]], follows: Seq[Follow],
      deadLetter: Boolean = false): (String, Option[String]) = {
    val feedPath = tmp("feed")
    val dlPath = if (deadLetter) Some(tmp("dl")) else None
    val input = memStream[String]
    val q = FeedStream.start(spark, input.toDF(), follows.toDS.toDF,
      feedPath, tmp("ckpt"), dlPath)
    try {
      messages.foreach { batch => input.addData(batch); q.processAllAvailable() }
    } finally q.stop()
    (feedPath, dlPath)
  }

  private def readFeed(path: String) =
    try spark.read.schema(Schemas.feedEntry).parquet(path).as[FeedEntry].collect().toSeq
    catch { case _: Throwable => Seq.empty[FeedEntry] }

  test("canonical scenario end-to-end: post lands in follower's feed only") {
    val (feedPath, _) = runPipeline(Seq(Seq(goodJson)), Seq(Follow("u-almaz", "u-nur")))
    val rows = readFeed(feedPath)
    assert(rows == Seq(FeedEntry("u-almaz", "p-100", "u-nur", "Hello from Nur!",
      Timestamp.valueOf("2026-01-01 00:00:00"))))
  }

  test("duplicate delivery within and across batches → exactly one feed row (ST1/ST2)") {
    val (feedPath, _) = runPipeline(
      Seq(Seq(goodJson, goodJson), Seq(goodJson)),
      Seq(Follow("u-almaz", "u-nur")))
    assert(readFeed(feedPath).size == 1)
  }

  test("invalid JSON → dead-letter, stream continues (ST4); empty value filtered (ST5)") {
    val (feedPath, dl) = runPipeline(
      Seq(Seq("{invalid-json}", "", goodJson)),
      Seq(Follow("u-almaz", "u-nur")), deadLetter = true)
    assert(readFeed(feedPath).size == 1) // good message still processed
    val dead = spark.read.parquet(dl.get).select("raw_value").as[String].collect()
    assert(dead.toSeq == Seq("{invalid-json}")) // empty value NOT dead-lettered
  }

  test("missing fields in otherwise-valid JSON → dead-letter (schema-on-read, §1.3)") {
    val noAuthor = """{"id":"p-1","body":"x","created":"2026-01-01T00:00:00Z"}"""
    val (feedPath, dl) = runPipeline(Seq(Seq(noAuthor)),
      Seq(Follow("u-almaz", "u-nur")), deadLetter = true)
    assert(readFeed(feedPath).isEmpty)
    assert(spark.read.parquet(dl.get).count() == 1)
  }

  test("restart from checkpoint does not duplicate feed rows (ST7)") {
    val feedPath = tmp("feed")
    val ckpt = tmp("ckpt")
    val follows = Seq(Follow("u-almaz", "u-nur")).toDS.toDF
    val input = memStream[String]
    val q1 = FeedStream.start(spark, input.toDF(), follows, feedPath, ckpt)
    input.addData(Seq(goodJson))
    q1.processAllAvailable()
    q1.stop()
    // second query, same checkpoint + same source content replayed
    val input2 = memStream[String]
    val q2 = FeedStream.start(spark, input2.toDF(), follows, feedPath, ckpt)
    input2.addData(Seq(goodJson)) // re-delivery after restart
    q2.processAllAvailable()
    q2.stop()
    assert(readFeed(feedPath).size == 1)
  }

  test("Fast mode: in-batch dedup + batch replay markers give exactly-once (ST1/ST2)") {
    val feedPath = tmp("feedfast")
    val in = memStream[String]
    val q = FeedStream.start(spark, in.toDF(), Seq(Follow("u-almaz", "u-nur")).toDS.toDF,
      feedPath, tmp("ckf"), dedupMode = FeedStream.Fast)
    try {
      in.addData(Seq(goodJson, goodJson)) // duplicate inside one batch
      q.processAllAvailable()
    } finally q.stop()
    assert(readFeed(feedPath).size == 1)
    // crash-replay of an already-committed batch: marker short-circuits
    val replayRows = Seq(FeedEntry("u-almaz", "p-100", "u-nur", "x", null)).toDS.toDF
    val appended = IdempotentSink.appendOnce(spark, replayRows, 0L, feedPath, Schemas.feedKey)
    assert(appended == 0L)
  }

  test("sink failure leaves no commit marker; retry of the same batch succeeds (store-failure negative)") {
    // mirror of the reference's failing-store doubles (worker_test.go):
    // a write that throws must not mark the batch committed.
    val base = tmp("failsink")
    val blocker = java.nio.file.Paths.get(base, "feed")
    java.nio.file.Files.writeString(blocker, "not-a-directory") // poison target
    val rows = Seq(FeedEntry("u-1", "p-1", "a", "b",
      Timestamp.valueOf("2026-01-01 00:00:00"))).toDS.toDF
    intercept[Throwable] {
      IdempotentSink.appendOnce(spark, rows, 7L, blocker.toString, Schemas.feedKey)
    }
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(blocker.toString, "_graft_commits", "7")))
    // operator recovers: same batchId against a healthy path commits once
    java.nio.file.Files.delete(blocker)
    assert(IdempotentSink.appendOnce(spark, rows, 7L, blocker.toString, Schemas.feedKey) == 1L)
    assert(IdempotentSink.appendOnce(spark, rows, 7L, blocker.toString, Schemas.feedKey) == 0L)
  }

  test("Fast mode crash window: inflight marker triggers anti-join reconcile, no double append") {
    val path = tmp("inflight")
    val rows = Seq(FeedEntry("u-1", "p-1", "a", "b",
      Timestamp.valueOf("2026-01-01 00:00:00"))).toDS.toDF
    // simulate a crash AFTER a fully successful append but BEFORE the
    // commit marker: data present, inflight marker present, no commit.
    rows.write.mode("append").parquet(path)
    val commits = java.nio.file.Paths.get(path, "_graft_commits")
    java.nio.file.Files.createDirectories(commits)
    java.nio.file.Files.createFile(commits.resolve("3.inflight"))
    // replay of batch 3 must reconcile instead of re-appending the batch
    assert(IdempotentSink.appendOnce(spark, rows, 3L, path, Schemas.feedKey) == 0L)
    assert(spark.read.parquet(path).count() == 1)
    assert(java.nio.file.Files.exists(commits.resolve("3")))
    assert(!java.nio.file.Files.exists(commits.resolve("3.inflight")))
    // and the NEXT batch takes the fast path again (no reconcile marker left behind)
    val rows2 = Seq(FeedEntry("u-2", "p-2", "a", "b",
      Timestamp.valueOf("2026-01-01 00:00:01"))).toDS.toDF
    assert(IdempotentSink.appendOnce(spark, rows2, 4L, path, Schemas.feedKey) == 1L)
  }

  test("multi-batch multi-author fan-out preserves the delivery invariant (F5)") {
    val follows = (1 to 4).map(i => Follow(s"u-$i", "a-1")) ++
      (3 to 6).map(i => Follow(s"u-$i", "a-2"))
    def msg(id: String, author: String) =
      s"""{"id":"$id","author_id":"$author","body":"b","created":"2026-01-01T00:00:00Z"}"""
    val (feedPath, _) = runPipeline(
      Seq(Seq(msg("p-1", "a-1"), msg("p-2", "a-2")), Seq(msg("p-3", "a-1"))),
      follows)
    val feed = spark.read.parquet(feedPath)
    assert(feed.count() == 4 + 4 + 4) // p-1:4 followers, p-2:4, p-3:4
    val posts = Seq(
      Post("p-1", "a-1", "b", Timestamp.valueOf("2026-01-01 00:00:00")),
      Post("p-2", "a-2", "b", Timestamp.valueOf("2026-01-01 00:00:00")),
      Post("p-3", "a-1", "b", Timestamp.valueOf("2026-01-01 00:00:00"))).toDS.toDF
    assert(Fanout.deliveryInvariantHolds(posts, follows.toDS.toDF, feed))
  }
}
