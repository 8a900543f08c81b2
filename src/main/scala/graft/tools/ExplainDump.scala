package graft.tools

import graft.{GraftSession, PlanCapture, SparkEntry}

/** Dump `.explain("formatted")` for named queries to files — the
  * round's plan-evidence artifacts (plans/r<N>/<query>_<tag>.txt).
  * Queries that eagerly checkpoint intermediates truncate their final
  * lineage, so each query runs under [[PlanCapture.audited]] and the
  * captured pre-checkpoint sub-plans are appended after the final
  * formatted plan (same merge rule as PlanAudit).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> <q1,q2,...> [sfDir]
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <tag> <q1,q2,...> [sfDir]")
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val dir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val (df, subPlans) = PlanCapture.audited(q)(SparkEntry.queries(q)(spark, dir))
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val body = (s"=== $q [$tag] final plan (formatted) ===\n" + formatted) +:
        subPlans
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${q}_$tag.txt"),
        body.mkString("\n\n"))
      println(s"wrote $outDir/${q}_$tag.txt (${subPlans.size} sub-plans)")
    }
    spark.stop()
  }
}
