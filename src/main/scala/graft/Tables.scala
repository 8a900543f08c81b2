package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog over the driver-generated parquet corpus (TESTDATA.md).
  *
  * Each table is a plain parquet scan — Catalyst pushes filters and
  * prunes columns into the scan, which replaces the reference's
  * per-query denormalized Cassandra tables (SURVEY.md §4: the reverse
  * index `followers_by_followee` becomes predicate pushdown on one edge
  * table).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** Canonicalize `events.ts` to epoch-NANOS LongType regardless of
    * how the driver generated the parquet column. Generations have
    * shipped both TIMESTAMP(NANOS) (read as LongType nanos under
    * `nanosAsLong`) and TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ,
    * where `nanosAsLong` is a no-op) — downstream operators and the
    * DuckDB mirrors both assume the nanos contract (`ts div 1000` =
    * micros = `epoch_us(ts)`), so the unit is pinned HERE, once, and
    * every consumer stays encoding-agnostic. Session TZ is pinned UTC
    * (GraftSession/Verify/Bench), so the NTZ→TZ cast is the identity
    * wall-clock mapping DuckDB applies too. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => df // TIMESTAMP(NANOS) under nanosAsLong — already epoch nanos
      case TimestampNTZType =>
        df.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case TimestampType =>
        df.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case other => sys.error(s"unexpected events.ts type: $other")
    }
  }

  /** `events` with exact nanos (`ts`, LongType — see `normalizeTs`)
    * plus a usable micros timestamp (`ts_utc`). */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
}
