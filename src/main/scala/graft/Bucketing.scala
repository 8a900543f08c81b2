package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY §4: the
  * reference pre-joins at write time via denormalized tables; the
  * Spark equivalent keeps the tables NORMALIZED and pre-shuffles them
  * once at write time instead).
  *
  * Two tables bucketed on their join key with the same bucket count
  * join with ZERO exchanges: each task reads matching bucket files
  * from both sides. At 100 TB this converts every recurring join on
  * the key into a scan-only operation — pay the shuffle once at
  * ingest, never at query time.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`);
  * production would back this with a shared metastore.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted table. */
  def writeBucketed(df: DataFrame, tableName: String, path: String,
      bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  def table(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)

  /** True iff the physical plan of `df` contains no shuffle exchange
    * (broadcast exchanges don't count — they're not a repartition). */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !plan.linesIterator.exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
  }
}
