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
  private val CurrentMarker = "_graft_current"

  import java.nio.file.{Files, Path, Paths, StandardCopyOption}
  import scala.jdk.CollectionConverters._

  def bucketOf(userId: org.apache.spark.sql.Column, buckets: Int) =
    pmod(xxhash64(userId), lit(buckets.toLong))

  /** Write the feed partitioned by user bucket, rows sorted
    * newest-first within each partition. The bucket count is written
    * as layout metadata so readers can't silently probe the wrong
    * bucket (a wrong count would return an EMPTY result, not an
    * error).
    *
    * Publication is versioned, never in-place: data lands in a fresh
    * `v<N>/` directory, then the `_graft_current` pointer is swapped
    * via an atomic same-directory rename. Concurrent readers (cached
    * FileIndex handles from openFeed) keep reading the version they
    * opened — its files are untouched until `vacuum` — and a crash at
    * ANY point leaves the pointer on the previous complete version.
    * (A plain mode("overwrite") on the root would delete the whole
    * directory before rewriting: readers break mid-compact and a
    * crash loses the previous layout.) */
  def writeFeed(feed: DataFrame, path: String, buckets: Int = DefaultBuckets): Unit = {
    val root = Paths.get(path)
    Files.createDirectories(root)
    val version = s"v${versionsOn(root).map(versionNum).maxOption.getOrElse(0L) + 1}"
    val target = root.resolve(version)
    feed
      .withColumn("user_bucket", bucketOf(col("user_id"), buckets))
      .repartition(col("user_bucket"))
      .sortWithinPartitions(col("user_bucket"), col("user_id"), col("created_at").desc)
      .write.mode("overwrite")
      .partitionBy("user_bucket")
      .parquet(target.toString)
    Files.writeString(target.resolve("_graft_buckets"), buckets.toString)
    val tmp = root.resolve(CurrentMarker + ".tmp")
    Files.writeString(tmp, version)
    Files.move(tmp, root.resolve(CurrentMarker),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Compact a flat feed (as the streaming foreachBatch sink produces)
    * into the partitioned layout — the periodic maintenance job that
    * turns append-order files into pruned, read-optimized storage.
    * The stream keeps appending to `flatPath`; `compact` publishes the
    * full current state as a new version and repoints atomically, so
    * readers see either the old or the new state, never a mix. Call
    * `vacuum` afterwards (once in-flight readers drain) to drop
    * superseded versions. */
  def compact(spark: SparkSession, flatPath: String, warehousePath: String,
      buckets: Int = DefaultBuckets): Unit =
    writeFeed(spark.read.parquet(flatPath), warehousePath, buckets)

  /** Delete all superseded version directories. Safe once no reader
    * still holds a FeedTable opened before the latest writeFeed. */
  def vacuum(path: String): Unit = {
    val root = Paths.get(path)
    val current = currentVersion(root)
    if (current.isEmpty) return // legacy flat layout: nothing versioned to drop
    versionsOn(root).filterNot(_ == current).foreach { v =>
      val w = Files.walk(root.resolve(v))
      val all = try w.iterator().asScala.toSeq finally w.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }

  private def versionNum(v: String): Long = v.stripPrefix("v").toLong

  private def versionsOn(root: Path): Seq[String] =
    if (!Files.isDirectory(root)) Seq.empty
    else {
      val s = Files.list(root)
      try s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.drop(1).nonEmpty && n.drop(1).forall(_.isDigit))
        .toSeq
      finally s.close()
    }

  /** Version named by the `_graft_current` pointer. A directory
    * without the pointer but WITH version dirs is a torn/corrupt
    * state → explicit error; without either it's a legacy flat layout
    * (pre-versioning writeFeed) → treat the root itself as the data
    * dir so old feeds stay readable. */
  private def currentVersion(root: Path): String = {
    val marker = root.resolve(CurrentMarker)
    if (Files.exists(marker)) Files.readString(marker).trim
    else if (versionsOn(root).nonEmpty)
      throw new IllegalStateException(
        s"$root has version directories but no $CurrentMarker pointer — " +
          "torn publish; restore the pointer or rewrite with writeFeed")
    else "" // legacy flat layout: data + _graft_buckets live at the root
  }

  /** Directory of the current published version. */
  def currentDataDir(path: String): String =
    Paths.get(path).resolve(currentVersion(Paths.get(path))).toString

  /** Bucket count recorded at write time (of the current version). */
  def bucketCount(path: String): Int =
    Files.readString(
      Paths.get(currentDataDir(path), "_graft_buckets")).trim.toInt

  /** Handle to an opened feed table: ONE directory listing (Spark
    * caches the FileIndex in the DataFrame), many pruned point
    * queries. Re-listing per query dominates read latency otherwise
    * (~6× at bench scale). The handle is pinned to the version current
    * at open time; a concurrent compact publishes alongside it. */
  final case class FeedTable(df: DataFrame, buckets: Int)

  def openFeed(spark: SparkSession, path: String): FeedTable =
    FeedTable(spark.read.parquet(currentDataDir(path)), bucketCount(path))

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
