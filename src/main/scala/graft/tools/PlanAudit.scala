package graft.tools

import graft.{GraftSession, SparkEntry}

/** Physical-plan sweep over every gate query: shuffle counts, join
  * strategies, scan pruning. The per-round "would this survive a
  * 100× scale-up" checklist.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("8", "plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-24s ${"exch"}%4s ${"bhj"}%4s ${"smj"}%4s ${"bnlj"}%5s ${"scans"}%5s ${"pushed"}%7s  flags")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        def c(s: String) = s.r.findAllIn(plan).length
        val exch = c("Exchange ") - c("BroadcastExchange ")
        val bhj = c("BroadcastHashJoin")
        val smj = c("SortMergeJoin")
        val bnlj = c("BroadcastNestedLoopJoin")
        val scans = c("FileScan parquet|Scan parquet")
        val pushed = c("PushedFilters: \\[[^\\]]")
        val flags = new StringBuilder
        if (smj > 0) flags.append(" SMJ!")
        if (plan.contains("CartesianProduct")) flags.append(" CARTESIAN!")
        if (exch > 6) flags.append(" MANY-SHUFFLES!")
        println(f"$name%-24s $exch%4d $bhj%4d $smj%4d $bnlj%5d $scans%5d $pushed%7d  ${flags.toString}")
      } catch {
        case e: Throwable => println(f"$name%-24s FAILED: ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
