package graft.feed

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** UUID-v4-shaped value derived deterministically from `cols`
    * (md5 → 8-4-4-4-12 with the version nibble forced to '4' and the
    * variant nibble mapped into [89ab]). Same inputs → same id, which
    * is what lets post_id-keyed dedup downstream mask checkpoint
    * replay — a replayed batch regenerates the SAME ids, so the
    * anti-join in IdempotentSink sees them as duplicates.
    *
    * ID-FORMAT v2 (do not change casually): nulls coalesce to u0001
    * and columns join on u0000 (escape spellings), so ("a", null) and ("a") mint
    * DIFFERENT ids — v1 (concat_ws's skip-null with a raw NUL
    * separator byte in source) collapsed them. Determinism only masks
    * replay WITHIN one format: an upgrade across formats regenerates
    * NEW ids for in-flight batches, and the idempotent sink will not
    * recognize the replays. Upgrade procedure: drain the stream (let
    * the last pre-upgrade batch commit), then deploy + reset the
    * checkpoint; never swap formats under a live checkpoint. */
  def deterministicUuid(cols: Column*): Column = {
    val h = md5(concat_ws("\u0000", cols.map(c => coalesce(c, lit("\u0001"))): _*))
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit("4"), substring(h, 14, 3)),
      concat(translate(substring(h, 17, 1),
        "0123456789abcdef", "89ab89ab89ab89ab"), substring(h, 18, 3)),
      substring(h, 21, 12))
  }

  /** SC3/SC5 — server-side row construction (reference
    * httphandlers.go:140-145): assign a post_id and the current
    * timestamp to raw (author_id, body) submissions.
    *
    * post_id is DETERMINISTIC content hash, not `uuid()`: inside a
    * replayable stream, a non-deterministic id would be regenerated
    * fresh on checkpoint replay and the downstream post_id-keyed dedup
    * could not mask the replay (duplicate posts). `salt` scopes
    * uniqueness — pass the micro-batch id on the streaming path so the
    * same submission re-sent in a LATER batch is a new post, while a
    * REPLAY of the same batch reproduces the same ids. The `seq`
    * column disambiguates byte-identical submissions within one batch;
    * its assignment among identical rows is arbitrary but the produced
    * id multiset is deterministic because those rows are
    * indistinguishable. created_at stays current_timestamp(): it
    * differs across replay, but replayed rows are dropped on post_id
    * before it matters. */
  def withGeneratedIds(submissions: DataFrame, salt: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("author_id"), col("body")).orderBy(col("author_id"))
    submissions
      .withColumn("_seq", row_number().over(w))
      .withColumn("post_id",
        deterministicUuid(col("author_id"), col("body"), col("_seq"), lit(salt)))
      .withColumn("created_at", current_timestamp())
      .select("post_id", "author_id", "body", "created_at")
  }

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

  /** Start the dual-sink ingestion of a post stream (posts already
    * carry a post_id — e.g. client-assigned ids). */
  def start(spark: SparkSession, posts: DataFrame, topicDir: String,
      postsTable: String, checkpoint: String): StreamingQuery =
    startWith(spark, posts, topicDir, postsTable, checkpoint, (b, _) => b)

  /** Start the dual-sink ingestion of a RAW submission stream
    * (author_id, body): id assignment happens INSIDE foreachBatch with
    * the batch id as salt, so a checkpoint replay of batch N
    * regenerates the identical post_ids and the sinks' post_id-keyed
    * dedup masks it — the exactly-once claim holds end to end. */
  def startFromSubmissions(spark: SparkSession, submissions: DataFrame,
      topicDir: String, postsTable: String, checkpoint: String): StreamingQuery =
    startWith(spark, submissions, topicDir, postsTable, checkpoint,
      (b, batchId) => withGeneratedIds(b, salt = batchId.toString))

  private def startWith(spark: SparkSession, in: DataFrame, topicDir: String,
      postsTable: String, checkpoint: String,
      prepare: (DataFrame, Long) => DataFrame): StreamingQuery =
    in.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist() is best-effort only (eviction → recompute); with
        // DETERMINISTIC ids a recompute yields the same rows, so the
        // two sinks agree even if the cache drops mid-batch.
        val b = prepare(batch, batchId).persist()
        try {
          // ST6: transient sink faults retry in place with the
          // reference backoff schedule; each attempt is safe because
          // the appends dedup on post_id (a partial append replays
          // into the anti-join). Exhausted retries fail the batch to
          // the streaming engine's checkpoint-replay backstop.
          Retry.withBackoff() {
            // sink 1: topic (idempotent on post_id via keyed dedup)
            IdempotentSink.appendDedup(spark, toEnvelope(b), topicDir, Seq("post_id"))
            // sink 2: source-of-truth posts table
            IdempotentSink.appendDedup(spark, b, postsTable, Seq("post_id"))
          }
          ()
        } finally { b.unpersist(); () }
      }
      .start()
}
