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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its TIMESTAMP(NANOS) `ts` exposed both as exact
    * nanos (`ts`, LongType when nanosAsLong is set) and as a usable
    * micros timestamp (`ts_utc`). If the session reads nanos natively
    * as TimestampType (nanosAsLong off), `ts` is passed through and
    * `ts_utc` aliases it. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      case _ => df.withColumn("ts_utc", col("ts"))
    }
  }
}
