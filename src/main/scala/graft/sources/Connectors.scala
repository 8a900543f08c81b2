package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Source/sink connector surface (SURVEY §2.1).
  *
  * Kafka builders (S1–S3) mirror the reference's tuning
  * (internal/broker/kafka.go): consumer group, fetch sizing, rate
  * limiting; producer batching/ordering. They produce standard
  * readStream/writeStream configs — exercised against a real broker
  * in deployment; in this offline build the identical pipeline is
  * driven through file/Memory sources (FeedStream tests), which share
  * the `value`-column contract.
  */
object Connectors {

  /** S1 — Kafka source (reference consumer: group `worker-group`,
    * MinBytes 10KB / MaxBytes 10MB, kafka.go:81-99). Offset tracking
    * moves to the checkpoint (exactly-once with the idempotent sink,
    * strictly better than the 1 s commit interval). */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      groupId: String = "worker-group",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val b = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .option("kafka.fetch.min.bytes", (10 * 1024).toString)
      .option("kafka.fetch.max.bytes", (10 * 1024 * 1024).toString)
      .option("failOnDataLoss", "false")
    maxOffsetsPerTrigger.fold(b)(n => b.option("maxOffsetsPerTrigger", n.toString)).load()
  }

  /** S2/S3 — Kafka sink (reference producer: batch 100, async,
    * single-partition total order via fixed key; kafka.go:40-66,
    * kafka_producer.go:26-38). Per-key ordering comes from the key
    * column; `repartition(1)` upstream reproduces the reference's
    * global order if required (documented cost: serializes the
    * write). */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String, batchSize: Int = 100): DataStreamWriter[Row] =
    df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("kafka.batch.size", (batchSize * 1024).toString)
      .option("kafka.linger.ms", "5")
      .option("checkpointLocation", checkpoint)

  /** Deployment path for a live Cassandra feed table (BASELINE.json
    * `spark_approach`): the spark-cassandra-connector sink. The
    * connector jar isn't in this offline build, so the writer is
    * config-only here (format resolution happens at start); the
    * Parquet-backed tables used everywhere else have identical key
    * semantics (SURVEY §2.1 S4/S5). */
  def cassandraFeedSink(df: DataFrame, keyspace: String, table: String,
      checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("org.apache.spark.sql.cassandra")
      .option("keyspace", keyspace)
      .option("table", table)
      .option("spark.cassandra.output.consistency.level", "QUORUM") // cassandra.go:58
      .option("checkpointLocation", checkpoint)

  /** S8 — CSV export (reference latency-vector dumps,
    * bench/e2e_bench/e2e_bench.go:246-255). */
  def csvExport(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode("overwrite").option("header", header.toString).csv(path)

  /** CSV read-back (schema-explicit, matching §1.3's no-inference
    * rule). */
  def csvSource(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)

  /** ORC export/source — the second columnar format the engine speaks
    * natively (predicate pushdown + column pruning work identically to
    * parquet). */
  def orcExport(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def orcSource(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSON-lines export/source (schema-explicit read — §1.3: unknown
    * fields dropped, missing fields null, exactly the worker's
    * json.Unmarshal behavior). */
  def jsonExport(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def jsonSource(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}

/** S9 — typed config from the environment (reference
  * internal/init/config.go:34-78: env + defaults, no Viper needed). */
case class GraftConfig(
    kafkaBootstrap: String,
    topic: String,
    groupId: String,
    partition: Int,
    warehouseDir: String,
    shufflePartitions: Int)

object GraftConfig {
  def fromEnv(env: Map[String, String] = sys.env): GraftConfig = GraftConfig(
    kafkaBootstrap = env.getOrElse("GRAFT_KAFKA_BOOTSTRAP", "localhost:9092"),
    topic = env.getOrElse("GRAFT_TOPIC", "feed-topic"),
    groupId = env.getOrElse("GRAFT_GROUP_ID", "worker-group"),
    partition = env.get("GRAFT_PARTITION").flatMap(_.toIntOption).getOrElse(0),
    warehouseDir = env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft-warehouse"),
    shufflePartitions = env.get("GRAFT_SHUFFLE_PARTITIONS").flatMap(_.toIntOption).getOrElse(32))
}
