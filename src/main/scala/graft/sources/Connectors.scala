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

  /** S1 consumer contract (reference kafka.go:85-95): consumer-group
    * reads with MinBytes 10e3 / MaxBytes 10e6 — the reference writes
    * DECIMAL 10e3/10e6, not 10 KiB/10 MiB. The 1 s CommitInterval has
    * no analog here: offset tracking moves to the streaming checkpoint
    * (exactly-once with the idempotent sink, strictly better than
    * interval commits). Exposed as a plain Map so the contract is
    * unit-assertable offline (KafkaContractSpec) — the builder below
    * consumes it verbatim. */
  def kafkaSourceOptions(bootstrap: String, topic: String,
      groupId: String = "worker-group"): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topic,
    "kafka.group.id" -> groupId,
    "kafka.fetch.min.bytes" -> "10000",    // kafka.go:92 MinBytes 10e3
    "kafka.fetch.max.bytes" -> "10000000", // kafka.go:93 MaxBytes 10e6
    "failOnDataLoss" -> "false")

  /** S1 — Kafka source. */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String,
      groupId: String = "worker-group",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame = {
    val b = spark.readStream.format("kafka")
      .options(kafkaSourceOptions(bootstrap, topic, groupId))
    maxOffsetsPerTrigger.fold(b)(n => b.option("maxOffsetsPerTrigger", n.toString)).load()
  }

  /** S2/S3 producer contract (reference kafka_producer.go:27,34-38:
    * 100-message batches, Async writer). The Spark sink's batching is
    * byte-sized, so the 100-message batch maps to 100 KiB with a 5 ms
    * linger — linger > 0 is the async-batch analog (send when the
    * batch fills OR the linger elapses, like the Go worker's
    * flush-on-full + final flush). Assertable offline like the source
    * map. */
  def kafkaSinkOptions(bootstrap: String, topic: String,
      batchSize: Int = 100): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "kafka.batch.size" -> (batchSize * 1024).toString,
    "kafka.linger.ms" -> "5")

  /** S2/S3 — Kafka sink. Per-key ordering comes from the key column;
    * `repartition(1)` upstream reproduces the reference's
    * single-partition total order if required (documented cost:
    * serializes the write). Live-broker smoke procedure:
    * docs/KAFKA_SMOKE.md. */
  def kafkaSink(df: DataFrame, bootstrap: String, topic: String,
      checkpoint: String, batchSize: Int = 100): DataStreamWriter[Row] =
    df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      .writeStream.format("kafka")
      .options(kafkaSinkOptions(bootstrap, topic, batchSize))
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
