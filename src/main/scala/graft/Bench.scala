package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (driver default sf0.1), one JSON line out.
  *
  * Methodology: one untimed warm-up pass (JIT + codegen + OS page
  * cache — a native engine's steady state is the fair baseline), then
  * TWO timed passes per query in sorted name order; each query reports
  * the min of its two runs. Min-of-2 because single-shot times on a
  * shared box showed 2-30× transient outliers (C2 compilation still
  * in flight on the earliest queries, neighbor contention) that say
  * nothing about the plan. `value` is the sum of per-query minima;
  * `cold_total_sec` reports the warm-up pass for reference.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.keys.toSeq.sorted
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      val dt =
        try { SparkEntry.queries(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      spark.catalog.clearCache() // queries that persist() must not tax successors (untimed)
      dt
    }

    val coldT0 = System.nanoTime()
    names.foreach(run)
    val cold = (System.nanoTime() - coldT0) / 1e9

    val pass1 = names.map(n => n -> run(n)).toMap
    val results = names.map { n =>
      val a = pass1(n); val b = run(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total_sec":$cold,"sf":"$sfDir"}""")
    spark.stop()
  }
}
