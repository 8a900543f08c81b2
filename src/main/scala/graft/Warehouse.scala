package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout of the materialized feed at warehouse scale —
  * the Spark replacement for the reference's Cassandra storage
  * optimizations (SURVEY §4):
  *
  *   - Cassandra "partition per user" → parquet directory partitioning
  *     on a hash bucket of user_id (bounded directory count; a raw
  *     user_id partition would create one dir per user).
  *   - Cassandra clustering `created_at DESC` → sortWithinPartitions
  *     on write: row groups arrive newest-first so a top-K read
  *     touches the head of each file; parquet min/max stats on
  *     created_at let scans skip old row groups.
  *
  * A feed read for one user prunes to 1/`buckets` of the data via
  * PartitionFilters (visible in .explain) — the same effect as
  * Cassandra's single-partition read, but with 100 TB-friendly file
  * counts. At cluster scale `buckets` scales with data volume;
  * per-user top-K cost stays O(user's own feed).
  */
object Warehouse {
  val DefaultBuckets = 64

  def bucketOf(userId: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(userId), lit(buckets.toLong))

  /** Write the feed partitioned by user bucket, rows sorted
    * newest-first within each partition. The bucket count is written
    * as layout metadata so readers can't silently probe the wrong
    * bucket (a wrong count would return an EMPTY result, not an
    * error). */
  def writeFeed(feed: DataFrame, path: String, buckets: Int = DefaultBuckets): Unit = {
    feed
      .withColumn("user_bucket", bucketOf(col("user_id"), buckets))
      .repartition(col("user_bucket"))
      .sortWithinPartitions(col("user_bucket"), col("user_id"), col("created_at").desc)
      .write.mode("overwrite")
      .partitionBy("user_bucket")
      .parquet(path)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_graft_buckets"), buckets.toString)
  }

  /** Compact a flat feed (as the streaming foreachBatch sink produces)
    * into the partitioned layout — the periodic maintenance job that
    * turns append-order files into pruned, read-optimized storage.
    * The stream keeps appending to `flatPath`; `compact` republishes
    * the full current state (overwrite is atomic per partition dir). */
  def compact(spark: SparkSession, flatPath: String, warehousePath: String,
      buckets: Int = DefaultBuckets): Unit =
    writeFeed(spark.read.parquet(flatPath), warehousePath, buckets)

  /** Bucket count recorded at write time. */
  def bucketCount(path: String): Int =
    java.nio.file.Files.readString(
      java.nio.file.Paths.get(path, "_graft_buckets")).trim.toInt

  /** Handle to an opened feed table: ONE directory listing (Spark
    * caches the FileIndex in the DataFrame), many pruned point
    * queries. Re-listing per query dominates read latency otherwise
    * (~6× at bench scale). */
  final case class FeedTable(df: DataFrame, buckets: Int)

  def openFeed(spark: SparkSession, path: String): FeedTable =
    FeedTable(spark.read.parquet(path), bucketCount(path))

  /** Single-user top-K against an opened table: the bucket predicate
    * prunes partitions via the cached file index, the user predicate
    * pushes into the scan, TakeOrderedAndProject caps the sort at k. */
  def feedTopK(table: FeedTable, userId: String, k: Int): DataFrame =
    table.df
      .filter(col("user_bucket") === bucketOf(lit(userId), table.buckets) &&
        col("user_id") === lit(userId))
      .orderBy(col("created_at").desc, col("post_id"))
      .limit(math.max(1, k))
      .drop("user_bucket")

  /** Convenience one-shot form (re-lists the directory — prefer
    * openFeed + feedTopK(table, …) for repeated reads). */
  def feedTopK(spark: SparkSession, path: String, userId: String, k: Int): DataFrame =
    feedTopK(openFeed(spark, path), userId, k)
}
