package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the q115/q116/q117 trio: funnel sequencing is
  * greedy-and-strict, triangle counting is exact under the degree
  * orientation, and the count-min grid never underestimates and
  * merges cell-wise. */
class GraphFunnelSketchSpec extends SparkSpec {
  import spark.implicits._

  // ---- funnel ----

  test("funnel counts only strictly-later steps off the greedy frontier") {
    // user 1 completes a→b→c; user 2 has b BEFORE its first a (and
    // none after) so it stalls at a; user 3 has a b at the SAME ts as
    // its a — strict > excludes it.
    val e = Seq(
      (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      (2L, "b", 5L), (2L, "a", 10L),
      (3L, "a", 10L), (3L, "b", 10L))
      .toDF("user_id", "event_type", "ts")
    val got = Temporal.funnelSteps(e, "user_id", "event_type", "ts",
        Seq("a", "b", "c"))
      .select(col("step"), col("n_users")).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  test("funnel frontier is greedy: an early step-1 keeps a later step-2 reachable") {
    // b happens twice; greedy takes the FIRST b after a (t=20), so the
    // c at t=25 (before the second b at t=40) still counts.
    val e = Seq((1L, "a", 10L), (1L, "b", 20L), (1L, "c", 25L), (1L, "b", 40L))
      .toDF("user_id", "event_type", "ts")
    val got = Temporal.funnelSteps(e, "user_id", "event_type", "ts",
        Seq("a", "b", "c"))
      .select(col("step"), col("n_users")).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("funnel step counts are monotonically non-increasing on the corpus") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val ns = Temporal.funnelSteps(e, "user_id", "event_type", "ts",
        Seq("signup", "view", "click", "purchase"))
      .orderBy(col("step_idx")).select(col("n_users")).as[Long].collect()
    assert(ns.length == 4 && ns.head > 0)
    assert(ns.sliding(2).forall { case Array(a, b) => a >= b })
  }

  // ---- triangles ----

  test("triangle counts: K4 has 4 triangles, 3 per node") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got = FeedShapes.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangle counts ignore direction, duplicates, and self-loops") {
    // one triangle {1,2,3} fed as a mess of both-direction duplicates
    // plus a self-loop and a dangling edge.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
        (1L, 1L), (4L, 5L))
      .toDF("u", "v")
    val got = FeedShapes.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangle total matches the naive all-triples count on a random-ish graph") {
    // deterministic pseudo-random graph on 40 nodes
    val pairs = for {
      u <- 0L until 40L; v <- (u + 1) until 40L
      if ((u * 31 + v * 17 + 7) % 5) == 0
    } yield (u, v)
    val edges = pairs.toDF("u", "v")
    val es = pairs.toSet
    def has(a: Long, b: Long) = es.contains((math.min(a, b), math.max(a, b)))
    val naive = (for {
      a <- 0L until 40L; b <- (a + 1) until 40L; c <- (b + 1) until 40L
      if has(a, b) && has(a, c) && has(b, c)
    } yield 1).size
    val perNode = FeedShapes.triangleCounts(edges).as[(Long, Long)].collect()
    assert(perNode.map(_._2).sum == 3L * naive)
  }

  // ---- count-min sketch ----

  test("CMS estimates are exact when no buckets collide, and never underestimate") {
    val toks = Seq.fill(5)("alpha") ++ Seq.fill(3)("beta") ++ Seq("gamma")
    val df = toks.toDF("tok")
    val counters = TextAnalysis.cmsCounters(df, "tok")
    val cands = Seq("alpha", "beta", "gamma").toDF("tok")
    val est = TextAnalysis.cmsEstimate(counters, cands, "tok")
      .as[(String, Long)].collect().toMap
    assert(est("alpha") >= 5L && est("beta") >= 3L && est("gamma") >= 1L)
    // 3 tokens into 4×1024 cells: collisions are impossible to rule
    // out a priori but with these fixed md5 hashes they don't occur.
    assert(est == Map("alpha" -> 5L, "beta" -> 3L, "gamma" -> 1L))
  }

  test("CMS grids merge cell-wise: sketch(a ++ b) == sketch(a) + sketch(b)") {
    val a = Seq("x", "x", "y").toDF("tok")
    val b = Seq("x", "z", "z").toDF("tok")
    val whole = TextAnalysis.cmsCounters(a.union(b), "tok")
      .as[(Int, Long, Long)].collect()
      .map { case (r, k, c) => ((r, k), c) }.toMap
    val merged = TextAnalysis.cmsCounters(a, "tok")
      .unionByName(TextAnalysis.cmsCounters(b, "tok"))
      .groupBy(col("r"), col("bkt")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect()
      .map { case (r, k, c) => ((r, k), c) }.toMap
    assert(whole == merged)
  }

  test("CMS overestimates under forced collisions (w=1) but stays an upper bound") {
    val df = (Seq.fill(4)("a") ++ Seq.fill(2)("b")).toDF("tok")
    val counters = TextAnalysis.cmsCounters(df, "tok", d = 2, w = 1)
    val est = TextAnalysis.cmsEstimate(counters, Seq("a", "b").toDF("tok"),
        "tok", d = 2, w = 1)
      .as[(String, Long)].collect().toMap
    // every token lands in the single cell: estimate = total count
    assert(est == Map("a" -> 6L, "b" -> 6L))
  }

  // ------------------------------------------------------------- HLL

  test("HLL registers max-merge across shards (the 100 TB combine)") {
    val all = (1 to 3000).map(i => ("g", i.toLong)).toDF("g", "v")
    val (a, b) = ((1 to 1500).map(i => ("g", i.toLong)).toDF("g", "v"),
      (1501 to 3000).map(i => ("g", i.toLong)).toDF("g", "v"))
    val whole = Aggregates.hllRegisters(all, "g", "v")
      .as[(String, Int, Int)].collect().map(r => (r._2, r._3)).toMap
    val merged = Aggregates.hllRegisters(a, "g", "v")
      .unionByName(Aggregates.hllRegisters(b, "g", "v"))
      .groupBy(col("g"), col("bkt")).agg(max(col("mj")).as("mj"))
      .as[(String, Int, Int)].collect().map(r => (r._2, r._3)).toMap
    assert(whole == merged)
  }

  test("HLL estimate within 25% at 5000 distinct (m=64 regime)") {
    val df = (1 to 5000).map(i => ("g", i.toLong)).toDF("g", "v")
    val est = Aggregates.hllEstimate(Aggregates.hllRegisters(df, "g", "v"), "g")
      .select("hll_est").as[Long].head()
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"est=$est")
  }

  test("HLL linear-counting branch fires at tiny cardinality and is close") {
    val df = (1 to 20).map(i => ("g", i.toLong)).toDF("g", "v")
    val row = Aggregates.hllEstimate(Aggregates.hllRegisters(df, "g", "v"), "g")
      .select("n_zero_regs", "hll_est").as[(Long, Long)].head()
    assert(row._1 > 0) // empty registers present -> small-range regime
    assert(math.abs(row._2 - 20.0) <= 6.0, s"est=${row._2}")
  }

  test("HLL estimate is a pure function of the value SET (dup-invariant)") {
    val once = (1 to 400).map(i => ("g", i.toLong)).toDF("g", "v")
    val dup = ((1 to 400) ++ (1 to 400)).map(i => ("g", i.toLong)).toDF("g", "v")
    val e1 = Aggregates.hllEstimate(Aggregates.hllRegisters(once, "g", "v"), "g")
      .select("hll_est").as[Long].head()
    val e2 = Aggregates.hllEstimate(Aggregates.hllRegisters(dup, "g", "v"), "g")
      .select("hll_est").as[Long].head()
    assert(e1 == e2)
  }
}
