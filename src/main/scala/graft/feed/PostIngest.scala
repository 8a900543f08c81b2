package graft.feed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The write path (SURVEY §3.1): one post DataFrame, two sinks —
  * the Kafka topic (JSON envelope, SC1 `to_json`) and the
  * source-of-truth posts table.
  *
  * The reference publishes to Kafka BEFORE the Cassandra insert
  * (httphandlers.go:160-170 — a worker can fan out a post whose
  * `posts` row doesn't exist yet, so consumers must not join back to
  * posts). We keep both writes in ONE foreachBatch so a crash between
  * them is replayed from the checkpoint; the envelope sink is
  * idempotent on post_id and the table sink dedups on its key —
  * strictly tighter than the reference's ordering gap.
  *
  * The "topic" here is a directory of JSON lines (the file analog of
  * the Kafka sink — swap `envelope.write.parquet/text` for
  * `format("kafka")` in deployment; the envelope columns key/value
  * are exactly Kafka's contract).
  */
object PostIngest {

  /** SC3/SC5 — server-side row construction (reference
    * httphandlers.go:140-145): assign a UUID v4 post_id and the
    * current timestamp to raw (author_id, body) submissions. */
  def withGeneratedIds(submissions: DataFrame): DataFrame =
    submissions
      .withColumn("post_id", org.apache.spark.sql.functions.expr("uuid()"))
      .withColumn("created_at", org.apache.spark.sql.functions.current_timestamp())
      .select("post_id", "author_id", "body", "created_at")

  /** Build the Kafka envelope: key = "post_created" (reference
    * httphandlers.go:154-158), value = JSON with the reference's
    * field names (`id`, `created` — models.go:10-15). */
  def toEnvelope(posts: DataFrame): DataFrame =
    posts.select(
      lit("post_created").as("key"),
      to_json(struct(
        col("post_id").as("id"),
        col("author_id"),
        col("body"),
        col("created_at").as("created"))).as("value"),
      col("post_id"))

  /** Start the dual-sink ingestion of a post stream. */
  def start(spark: SparkSession, posts: DataFrame, topicDir: String,
      postsTable: String, checkpoint: String): StreamingQuery =
    posts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          // sink 1: topic (idempotent on post_id via keyed dedup)
          IdempotentSink.appendDedup(spark, toEnvelope(b), topicDir, Seq("post_id"))
          // sink 2: source-of-truth posts table
          IdempotentSink.appendDedup(spark, b, postsTable, Seq("post_id"))
          ()
        } finally { b.unpersist(); () }
      }
      .start()
}
