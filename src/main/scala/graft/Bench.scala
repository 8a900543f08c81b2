package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (driver default sf0.1), one JSON line out.
  *
  * Methodology: one untimed warm-up pass (JIT + codegen + OS page
  * cache — a native engine's steady state is the fair baseline), then
  * one timed pass per query in sorted name order. `value` is the
  * timed total; `cold_total_sec` reports the warm-up pass for
  * reference.
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
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => return -1.0 }
      finally spark.catalog.clearCache() // queries that persist() must not tax successors
      (System.nanoTime() - t0) / 1e9
    }

    val coldT0 = System.nanoTime()
    names.foreach(run)
    val cold = (System.nanoTime() - coldT0) / 1e9

    val results = names.map(n => n -> run(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total_sec":$cold,"sf":"$sfDir"}""")
    spark.stop()
  }
}
