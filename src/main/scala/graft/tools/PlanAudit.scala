package graft.tools

import graft.{GraftSession, PlanCapture, SparkEntry}

/** Physical-plan sweep over every gate query: shuffle counts, join
  * strategies, scan pruning. The per-round "would this survive a
  * 100× scale-up" checklist.
  *
  * Queries that eagerly `localCheckpoint` intermediates (connected
  * components, the PQ family, q84) truncate lineage, so their FINAL
  * plan is a bare `Scan ExistingRDD`. Each query is therefore built
  * under [[PlanCapture.audited]], which records every pre-checkpoint
  * sub-plan; counts here are over final plan + all sub-plans, so the
  * expensive pre-checkpoint stages are audited too (round-6 verdict
  * residual #1). `ck` = number of checkpointed sub-plans merged in.
  * A query whose merged plan has neither a parquet scan nor a Range
  * source (q39 synthesizes its workload from spark.range by design)
  * is flagged `NO-SCAN!` and counted in the failing exit summary.
  *
  * `InMemoryRelation` nodes print their entire CACHED child plan
  * inline, so counting the raw string would re-count every persisted
  * subtree's scans/joins once per reference — q99's heavily-persisted
  * recipe read as 253 scans when its executed shape has a handful
  * (the cache computes once). `stripCached` drops each cached
  * subtree's text (every line indented deeper than its
  * InMemoryRelation header) before counting, so counts reflect what
  * actually executes.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  private[tools] def stripCached(plan: String): String = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var skipDepth = -1
    plan.split("\n").foreach { l =>
      val depth = l.indexWhere(c => !" :+-".contains(c)) match {
        case -1 => 0; case i => i
      }
      if (skipDepth >= 0 && depth > skipDepth) ()
      else {
        skipDepth = if (l.contains("InMemoryRelation")) depth else -1
        out += l
      }
    }
    out.mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("8", "plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    var noScan = List.empty[String]
    var failed = List.empty[String]
    println(f"${"query"}%-24s ${"exch"}%4s ${"bhj"}%4s ${"smj"}%4s ${"bnlj"}%5s ${"scans"}%5s ${"pushed"}%7s ${"ck"}%3s  flags")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val (df, subPlans) = PlanCapture.audited(name)(fn(spark, dir))
        val plan = stripCached(
          (df.queryExecution.executedPlan.toString +: subPlans).mkString("\n"))
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
        // A query is "sourced" if it reads parquet, a Range (q39's
        // synthesized workload), or a cached relation (whose one-time
        // compute scan lives in the stripped cached plan, e.g. q31's
        // persisted shingle table).
        if (scans == 0 && c("Range \\(") == 0 && c("InMemoryTableScan") == 0) {
          flags.append(" NO-SCAN!"); noScan ::= name
        }
        println(f"$name%-24s $exch%4d $bhj%4d $smj%4d $bnlj%5d $scans%5d $pushed%7d ${subPlans.size}%3d  ${flags.toString}")
      } catch {
        case e: Throwable =>
          failed ::= name
          println(f"$name%-24s FAILED: ${e.getMessage.take(60)}")
      }
    }
    println(s"# audited=${SparkEntry.queries.size} zero-scan=${noScan.size}" +
      (if (noScan.nonEmpty) noScan.sorted.mkString(" [", ",", "]") else "") +
      s" failed=${failed.size}" +
      (if (failed.nonEmpty) failed.sorted.mkString(" [", ",", "]") else ""))
    spark.stop()
    if (noScan.nonEmpty || failed.nonEmpty) sys.exit(1)
  }
}
