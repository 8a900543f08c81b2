package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Error bounds of the approximate (scale-path) aggregates vs their
  * exact counterparts. */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact; percentile_approx within p1-p99 spread") {
    val approx = Aggregates.approxStatsNative(spark, dir)
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val exact = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.99)").as("p99"))
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    exact.foreach { case (k, (_, u, p50, p99)) =>
      val (_, au, ap50, ap99) = approx(k)
      assert(math.abs(au - u).toDouble / u <= 0.05, s"$k users: $au vs $u")
      assert(math.abs(ap50 - p50) / math.max(1.0, p50) <= 0.05, s"$k p50: $ap50 vs $p50")
      assert(math.abs(ap99 - p99) / math.max(1.0, p99) <= 0.05, s"$k p99: $ap99 vs $p99")
    }
  }

  test("certified q41: KMV users within 25% and sampled percentiles within 10%/20% of exact") {
    val cert = Aggregates.approxStats(spark, dir)
      .as[(String, Double, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val exact = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.99)").as("p99"))
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(cert.keySet == exact.keySet)
    exact.foreach { case (k, (_, u, p50, p99)) =>
      val (_, au, n, ap50, ap99) = cert(k)
      assert(n > 0L && n <= 1000L, s"$k sample size $n")
      assert(math.abs(au - u) / u <= 0.25, s"$k users: $au vs $u")
      assert(math.abs(ap50 - p50) / math.max(1.0, p50) <= 0.10, s"$k p50: $ap50 vs $p50")
      assert(math.abs(ap99 - p99) / math.max(1.0, p99) <= 0.20, s"$k p99: $ap99 vs $p99")
    }
  }

  test("trimmedMean2P within 2% of the exact Aggregator (A3 scale path)") {
    // Two-pass trim is VALUE-based (keeps boundary-value ties) where
    // the exact form is row-based; on a continuous metric the paths
    // must agree tightly.
    val approx = Aggregates.trimmedMean2P(
        graft.Tables.load(spark, dir, "events"), "event_type", "value", 1.0)
      .as[(String, Double)].collect().toMap
    val exact = Aggregates.trimmedMean(spark, dir)
      .as[(String, Double)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e) / math.max(1.0, math.abs(e)) <= 0.02,
        s"$k trimmed mean: 2P $a vs exact $e")
    }
  }

  test("KMV Aggregator (O(k) state) equals the gated window form; estimate within 25% of exact") {
    val k = 64
    val ev = graft.Tables.load(spark, dir, "events")
    val aggForm = ev
      .select(col("event_type"), Aggregates.kmvHash(col("user_id")).as("h"))
      .groupBy(col("event_type"))
      .agg(round(graft.functions.SketchAggs.kmv_distinct(col("h"), k), 2).as("est"))
      .as[(String, Double)].collect().toMap
    val gated = Aggregates.kmvDistinct(spark, dir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(aggForm.keySet == gated.keySet)
    gated.foreach { case (t, (_, exact, winEst)) =>
      assert(aggForm(t) == winEst,
        s"$t: aggregator $aggForm vs window $winEst must match exactly")
      assert(math.abs(winEst - exact) / exact <= 0.25,
        s"$t: KMV est $winEst too far from exact $exact at k=$k")
    }
    // estimator degrades to the exact count below k distinct values
    val tiny = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L)).toDF("g", "v")
      .select(col("g"), Aggregates.kmvHash(col("v")).as("h"))
      .groupBy("g").agg(graft.functions.SketchAggs.kmv_distinct(col("h"), k).as("est"))
      .as[(String, Double)].collect().head
    assert(tiny._2 == 3.0)
  }
}
