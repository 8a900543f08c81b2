package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's tuned defaults.
  *
  * Designed for cluster scale even though tests run `local[N]`:
  *   - AQE on (runtime shuffle coalescing + skew-join splitting — the
  *     scale answer to the reference's fixed worker-pool sizing,
  *     reference cmd/worker/worker.go:29-42).
  *   - shuffle.partitions=32 matches local cores; on a real cluster this
  *     is overridden per-deploy (AQE coalesces the excess anyway).
  *   - Session TZ pinned UTC (reference stores UTC wall-clock,
  *     cmd/server/httphandlers.go:144).
  */
object GraftSession {
  /** Storage level for persisted TEXT-SIZED frames (corpus survivors,
    * shingle/token arrays, feature frames). Default DISK_ONLY — the
    * round-15 GC audit moved these off the heap because their
    * deserialized copies dominated old-gen in a long many-query JVM.
    * Env-tunable (round-16, VERDICT r15 item 1c) so the DISK-I/O-vs-GC
    * trade is measurable without a rebuild:
    * SPARK_GRAFT_TEXT_PERSIST=MEMORY_AND_DISK_SER keeps the frames as
    * serialized in-memory bytes (compact, low-GC) and spills only on
    * pressure — the candidate middle ground if the driver box's disk
    * is the contended resource. Accepts any StorageLevel name. */
  val textFrameLevel: org.apache.spark.storage.StorageLevel =
    org.apache.spark.storage.StorageLevel.fromString(
      sys.env.getOrElse("SPARK_GRAFT_TEXT_PERSIST", "DISK_ONLY")
        .trim.toUpperCase)

  def local(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName: String = "graft"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.ts is parquet TIMESTAMP(NANOS); Spark's
      // TimestampType is microseconds. Reading nanos as LongType keeps
      // full precision and lets queries compare exactly against
      // DuckDB's epoch_ns().
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions) // dot_product/hamming as SQL functions
    quietBoundedWindowWarnings()
    b.getOrCreate()
  }

  /** Apply graft defaults to an externally-built session (driver's
    * Verify/Bench mains create their own). */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    quietBoundedWindowWarnings()
    spark
  }

  /** The audit/report operators intentionally use GLOBAL
    * (unpartitioned) window frames on post-aggregation results that
    * are bounded by construction — histograms, per-source summaries,
    * top-k shortlists of at most a few thousand rows. Spark's window
    * exec can't see that bound and warns "No Partition Defined for
    * Window operation!" on every such frame (~147 times per full gate
    * run — VERDICT r10 item 7: correct plans, drowned logs). Those
    * single-partition moves are exactly what a bounded frame wants,
    * so silence precisely THAT MESSAGE and nothing else — a
    * StringMatchFilter on the window-exec logger config (round-12
    * ADVICE: the earlier whole-logger ERROR level also swallowed
    * genuine window warnings like spill-to-disk, process-wide). Any
    * UNBOUNDED global window would still be caught by the plan
    * audit (PlanAudit flags corpus-sized exchanges), which is the
    * right tool for that failure, not a per-query log line. */
  def quietBoundedWindowWarnings(): Unit =
    try {
      import org.apache.logging.log4j.LogManager
      import org.apache.logging.log4j.core.{Filter, LoggerContext}
      import org.apache.logging.log4j.core.config.LoggerConfig
      import org.apache.logging.log4j.core.filter.StringMatchFilter
      val name = "org.apache.spark.sql.execution.window"
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration
      val existing = cfg.getLoggerConfig(name)
      val target =
        if (existing.getName == name) existing
        else {
          val lc = new LoggerConfig(name, existing.getLevel, true)
          cfg.addLogger(name, lc)
          lc
        }
      // idempotent across repeated session builds, and composable with
      // a pre-existing filter (round-13 ADVICE: requiring the single
      // filter slot to be EMPTY silently skipped the deny when a user
      // log4j2 config already installed one): addFilter composes into
      // a CompositeFilter, so only skip when OUR match string is
      // already present somewhere in the chain
      val matchStr = "No Partition Defined for Window operation"
      def hasOurs(f: Filter): Boolean = f match {
        case null => false
        case s: StringMatchFilter => s.toString == matchStr // toString IS the match text
        case c: org.apache.logging.log4j.core.filter.CompositeFilter =>
          c.getFiltersArray.exists(hasOurs)
        case _ => false
      }
      if (!hasOurs(target.getFilter)) {
        target.addFilter(StringMatchFilter.newBuilder()
          .setMatchString(matchStr)
          .setOnMatch(Filter.Result.DENY)
          .setOnMismatch(Filter.Result.NEUTRAL)
          .build())
        ctx.updateLoggers()
      }
    } catch { case _: Throwable => () } // cosmetic only — never fail a session on it
}
