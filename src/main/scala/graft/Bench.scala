package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (driver default sf0.1), one JSON line out.
  *
  * Methodology: one untimed warm-up pass (JIT + codegen + OS page
  * cache — a native engine's steady state is the fair baseline), then
  * TWO timed passes per query in sorted name order; each query reports
  * the min of its two runs, with an adaptive THIRD rep for queries
  * over 1s whose two reps disagree by >30% (at least one rep caught
  * neighbor contention). Min-of-reps because single-shot times on a
  * shared box showed 2-30× transient outliers (C2 compilation still
  * in flight on the earliest queries, neighbor contention) that say
  * nothing about the plan. `value` is the sum of per-query minima;
  * `cold_total_sec`/`cold_queries` report the warm-up pass in total
  * and per query, and `load_before/after` + `jvms_before/after` stamp
  * host load so driver-vs-local deltas are attributable.
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
      // 69 queries × several codegen'd stages each blow far past the
      // default 100-entry generated-class cache — every "warm" run was
      // re-compiling its whole-stage code, a flat recompilation tax on
      // each query in the full suite that an isolated run never pays.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Dev loop: SPARK_GRAFT_ONLY=q22,q55 restricts to queries whose
    // name starts with any of the prefixes (driver runs unfiltered).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).filter(_.nonEmpty))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      val dt =
        try { SparkEntry.queries(name)(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      // Untimed inter-query cleanup. clearCache() drops persist()ed
      // plans, but NOT localCheckpoint blocks — those live as
      // RDD-level persistence, reclaimed by the ContextCleaner only
      // after the driver GCs the RDD reference. The round-3 fix
      // (clearCache + gc) relied on the cleaner winning that race and
      // lost it at 69×3 runs: blocks accumulated and taxed the heavy
      // queries 3-5× (q55 11.3s recorded vs 2.25s isolated in round
      // 4). getPersistentRDDs covers BOTH populations — cache-backed
      // and checkpoint RDDs — and unpersist(blocking=true) frees their
      // blocks synchronously, no GC race. Safe here because every
      // query builds its plans from scratch.
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
      dt
    }

    // Host-load stamps: the round-5 driver cold total disagreed ~2.3×
    // with repeated local runs and the artifact couldn't attribute the
    // gap. loadavg + concurrent-JVM counts before/after let a reader
    // tell plan regressions from neighbor contention on a shared box.
    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
        .split(" ").take(3).mkString("[", ",", "]")
      catch { case _: Throwable => "[]" }
    def javaProcs(): Int =
      try new java.io.File("/proc").listFiles.count { f =>
        f.getName.forall(_.isDigit) && {
          try {
            val src = scala.io.Source.fromFile(s"/proc/${f.getName}/comm")
            try src.mkString.trim == "java" finally src.close()
          } catch { case _: Throwable => false }
        }
      } catch { case _: Throwable => -1 }
    val loadBefore = loadavg(); val jvmsBefore = javaProcs()

    // Cold pass: timed PER QUERY (not just in total) so a slow cold
    // total is attributable to specific queries, not a mystery.
    val coldT0 = System.nanoTime()
    val coldPerQ = names.map(n => n -> run(n))
    val cold = (System.nanoTime() - coldT0) / 1e9

    val pass1 = names.map(n => n -> run(n)).toMap
    val results = names.map { n =>
      val a = pass1(n); val b = run(n)
      val m = if (a < 0 || b < 0) math.max(a, b) else math.min(a, b)
      // Adaptive third rep: when a heavy query's two reps disagree by
      // >30%, at least one caught neighbor contention (this box shows
      // up to 2× transient load bursts) — one more rep, overall min.
      // Bounded cost: only slow AND noisy queries pay it.
      n -> (if (m > 1.0 && a > 0 && b > 0 &&
                math.max(a, b) / math.min(a, b) > 1.3) math.min(m, run(n))
            else m)
    }
    val loadAfter = loadavg(); val jvmsAfter = javaProcs()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val cqs = coldPerQ.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""cold_total_sec":$cold,"cold_queries":$cqs,""" +
        s""""load_before":$loadBefore,"load_after":$loadAfter,""" +
        s""""jvms_before":$jvmsBefore,"jvms_after":$jvmsAfter,"sf":"$sfDir"}"""
    println(json)
    // The single giant stdout line is fragile under the driver's
    // capture window (BENCH_r04 arrived truncated mid-JSON) — also
    // land it in a file so the artifact survives.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
