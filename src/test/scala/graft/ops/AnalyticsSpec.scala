package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the round-8 analytics surface (q133–q144 families). */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("basketLiftOf: exact lift on a hand-built basket set") {
    // 4 baskets; A+B co-occur twice, A appears 3x, B 2x.
    // lift(A,B) = n_ab*N/(n_a*n_b) = 2*4/(3*2) = 1.3333 -> 1333333 fx
    val items = Seq(
      (1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "C"), (4L, "C"), (4L, "D"),
      (1L, "A")) // dup line in a basket must not double-count
      .toDF("okey", "brand")
    val got = Analytics.basketLiftOf(items, "okey", "brand", minPairs = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("A", "B")) == ((2L, 1333333L)))
    assert(got(("A", "C")) == ((1L, 666666L)))
    assert(got(("C", "D")) == ((1L, 2000000L)))
  }

  test("quartileSummary: 8 uniform rows split 2-2-2-2 with exact cume fractions") {
    val df = (1 to 8).map(i => ("g", i.toLong * 10, i.toLong)).toDF("g", "v", "id")
    val got = Analytics.quartileSummary(df, "g", "v", "id").collect()
    assert(got.map(_.getInt(1)).toSeq == Seq(1, 2, 3, 4))
    assert(got.map(_.getLong(2)).forall(_ == 2L))
    assert(got.map(_.getLong(5)).toSeq ==
      Seq(250000L, 500000L, 750000L, 1000000L))
    // bucket bounds are the exact member values
    assert(got.head.getLong(3) == 10L && got.head.getLong(4) == 20L)
    assert(got.last.getLong(3) == 70L && got.last.getLong(4) == 80L)
  }

  test("modePerGroup: tie breaks to the lexicographically first value") {
    val df = Seq((1L, "b"), (1L, "a"), (1L, "b"), (1L, "a"), (2L, "z"))
      .toDF("u", "t")
    val m = Analytics.modePerGroup(df, "u", "t").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m(1L) == (("a", 2L)))
    assert(m(2L) == (("z", 1L)))
  }

  test("histogram: exact integer bin edges, top value clamped, degenerate group in bin 0") {
    val df = (0L to 100L).map(v => ("g", v)).toDF("g", "v")
      .union(Seq(("one", 7L), ("one", 7L)).toDF("g", "v"))
    val got = Analytics.histogram(df, "g", "v", bins = 10).collect()
    val g = got.filter(_.getString(0) == "g")
    // 101 values over [0,100]: bins 0..8 get 10 each, bin 9 gets 11 (90..100)
    assert(g.map(r => r.getLong(1) -> r.getLong(2)).toMap ==
      (0L to 8L).map(_ -> 10L).toMap + (9L -> 11L))
    val one = got.filter(_.getString(0) == "one")
    assert(one.length == 1 && one.head.getLong(1) == 0L && one.head.getLong(2) == 2L)
  }

  test("conversionLatencyOf: only purchases after the first signup count") {
    // user 1: signup@1000ns, purchase@4000ns -> 3us... ns scale: use ms-sized nanos
    val e = Seq(
      (1L, "signup", 1000000L), (1L, "purchase", 4000000L),
      (1L, "purchase", 9000000L), // later purchase ignored (first-after wins)
      (2L, "purchase", 500000L), (2L, "signup", 1000000L), // pre-signup purchase only
      (3L, "signup", 2000000L), (3L, "purchase", 8000000L))
      .toDF("user_id", "event_type", "ts")
    val r = Analytics.conversionLatencyOf(e, "user_id", "event_type", "ts",
      "signup", "purchase").collect().head
    // latencies us: user1 (4000000-1000000)/1000 = 3000, user3 6000
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(2) == 4500.0) // p50 of {3000, 6000}
  }

  test("sessionPathsOf: paths split at the gap and truncate to maxSteps") {
    val base = 1_700_000_000_000_000L // epoch micros
    def ev(u: Long, id: Long, t: String, offsetMin: Long) =
      (id, (base + offsetMin * 60_000_000L) * 1000L, u, t)
    val e = Seq(
      ev(1, 1, "view", 0), ev(1, 2, "click", 1), ev(1, 3, "purchase", 2),
      ev(1, 4, "view", 60), ev(1, 5, "click", 61), // second session after gap
      ev(2, 6, "view", 0), ev(2, 7, "click", 1), ev(2, 8, "purchase", 2))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
    val got = Analytics.sessionPathsOf(e, "user_id", "event_type",
      "30 minutes", maxSteps = 2, topK = 10)
      .as[(String, Long)].collect().toMap
    assert(got == Map("view>click" -> 3L))
  }

  test("stratifiedKFold: deterministic and stable under corpus growth") {
    val d1 = (1L to 200L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val f1 = CurationOps.stratifiedKFold(d1, "doc_id", "source", 5)
      .select("doc_id", "fold").as[(Long, Int)].collect().toMap
    assert(f1.values.forall(f => f >= 0 && f < 5))
    assert(f1.values.toSet.size == 5) // all folds hit
    // a doc's fold must not change when the corpus doubles
    val d2 = (1L to 400L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val f2 = CurationOps.stratifiedKFold(d2, "doc_id", "source", 5)
      .select("doc_id", "fold").as[(Long, Int)].collect().toMap
    assert(f1.forall { case (id, f) => f2(id) == f })
  }

  test("repeatedNgrams: planted cross-doc 8-gram tops the report; short docs ignored") {
    val gram = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$gram x y z", "s1"),
      (2L, s"p q $gram", "s1"),
      (3L, s"m n o $gram w", "s2"),
      (4L, "tiny doc", "s3"), // < 8 tokens: no windows
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "s3"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.repeatedNgrams(docs, "doc_id", "source", "text",
      n = 8, minDocs = 2, topK = 5).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getString(0) == gram && r.getLong(1) == 3L &&
      r.getLong(2) == 2L && r.getLong(3) == 3L)
  }

  test("labelPropagation: two triangles bridged by one edge settle into two communities") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L),
      (3L, 4L), (7L, 8L)) // plus an isolated pair
      .toDF("u", "v")
    val got = FeedShapes.labelPropagation(edges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L)
    assert(got(4L) == 3L && got(5L) == 3L && got(6L) == 3L)
    // the 7-8 pair oscillates synchronously: after odd rounds each
    // holds the other's id — deterministic either way
    assert(Set(got(7L), got(8L)) == Set(7L, 8L))
  }

  test("kCore: K4 survives 3-core peeling, pendant chain and triangle dissolve") {
    // K4 on {1,2,3,4} + chain 4-5-6 + triangle {7,8,9}
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (7L, 8L), (8L, 9L), (7L, 9L))
      .toDF("u", "v")
    val got = FeedShapes.kCore(edges, k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // round 1 drops 6 (deg 1), 5 (deg 2) and the whole triangle
    // (deg 2 each); the K4 then induces degree exactly 3 and is stable
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: k=2 keeps every cycle, drops only the pendant path") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val got = FeedShapes.kCore(edges, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("vocabGrowthOf: cumulative volume and vocabulary per chunk") {
    // 4 docs -> 2 chunks of 2; chunk1 vocab {a,b,c}, chunk2 adds {d}
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "a d"), (4L, "d d d"))
      .toDF("doc_id", "text")
    val got = Analytics.vocabGrowthOf(docs, "doc_id", "text", 2)
      .as[(Int, Long, Long)].collect().toSeq
    assert(got == Seq((1, 4L, 3L), (2, 9L, 4L)))
  }

  test("zipfSlopeOf: exact power-law frequencies recover slope -1") {
    // freq(r) = 720/r for r=1..6 exactly (720 = lcm), one token per rank
    val words = (1 to 6).flatMap(r => Seq.fill(720 / r)(s"w$r"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = Analytics.zipfSlopeOf(docs, "text", 10).collect().head
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getLong(1) + 1000000L) < 100L) // slope_fx ~ -1e6
  }

  test("columnProfileOf: null and distinct counts per column in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (None, Some("b")),
      (Some(2L), Some("a")))
      .toDF("x", "y")
    val got = Analytics.columnProfileOf(df, Seq("x", "y")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("x") == ((1L, 2L)))
    assert(got("y") == ((1L, 2L)))
  }

  test("mmrTopK: pure-relevance lambda reduces to top-k; diversity skips the near-dup") {
    // 0 = query; 1 and 2 nearly identical and most relevant; 3 orthogonal-ish
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.1f, 0f, 0f)),
      (2L, Array(0.98f, 0.12f, 0f, 0f)),
      (3L, Array(0.5f, 0f, 0.8f, 0f)),
      (4L, Array(0.4f, 0f, 0f, 0.9f)))
      .toDF("vec_id", "embedding")
    val pure = Similarity.mmrTopK(vecs, "vec_id", "embedding",
      col("vec_id") === 0, poolK = 4, k = 3, lambdaTenths = 10)
      .select("step", "id").as[(Int, Long)].collect().toMap
    assert(pure == Map(1 -> 1L, 2 -> 2L, 3 -> 3L)) // plain relevance order
    val div = Similarity.mmrTopK(vecs, "vec_id", "embedding",
      col("vec_id") === 0, poolK = 4, k = 3, lambdaTenths = 5)
      .select("step", "id").as[(Int, Long)].collect().toMap
    assert(div(1) == 1L)
    assert(div(2) == 3L) // near-dup 2 deferred in favor of diverse 3
  }

  test("goodTuringOf: hand-computed Chao1 through the wide-decimal correction path") {
    // bigrams: "x y":2, "y x":1, "a b":1 → n_tokens=4, vocab=3,
    // n1=2, n2=1; unseen = 2e6 div 4 = 500000;
    // chao1 = 3e6 + (2·1·1e6) div (2·(1+1)) = 3e6 + 500000
    val d = Seq(("s", "x y x y"), ("s", "a b")).toDF("source", "text")
    val got = Analytics.goodTuringOf(d)
      .select("source", "n_tokens", "vocab", "n1", "n2",
        "unseen_mass_fx", "chao1_fx")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got == List(("s", 4L, 3L, 2L, 1L, 500000L, 3500000L)))
  }
}
