package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The Kafka connector contract, pinned to the reference's tuning
  * values so the S1–S3 claim is falsifiable offline: the option maps
  * below are consumed verbatim by the readStream/writeStream builders
  * (Connectors.kafkaSource/kafkaSink), and this container has no
  * kafka-clients jar or broker, so the maps ARE the testable surface.
  * The live-broker procedure is docs/KAFKA_SMOKE.md.
  */
class KafkaContractSpec extends AnyFunSuite {

  test("S1 consumer contract matches reference kafka.go:85-95") {
    val opts = Connectors.kafkaSourceOptions("broker:9092", "feed-topic", "worker-group")
    // kafka.go:92-93 write DECIMAL 10e3 / 10e6 — not 10 KiB / 10 MiB.
    assert(opts("kafka.fetch.min.bytes") == "10000")
    assert(opts("kafka.fetch.max.bytes") == "10000000")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "feed-topic")
    // kafka.go:89-91: consumer-group reads (GroupID), not raw partitions.
    assert(opts("kafka.group.id") == "worker-group")
    // kafka.go:94 CommitInterval 1s has no analog: offsets live in the
    // streaming checkpoint (exactly-once with the idempotent sink), so
    // a data-loss gap must surface as a restartable error, not a crash.
    assert(opts("failOnDataLoss") == "false")
    assert(!opts.contains("kafka.commit.interval.ms"))
  }

  test("S2/S3 producer contract matches reference kafka_producer.go:27,34-38") {
    val opts = Connectors.kafkaSinkOptions("broker:9092", "feed-topic", batchSize = 100)
    // 100-message batches map to 100 KiB byte-batches + 5 ms linger
    // (linger > 0 = the Async writer analog: send on batch-full OR
    // linger elapse).
    assert(opts("kafka.batch.size") == (100 * 1024).toString)
    assert(opts("kafka.linger.ms") == "5")
    assert(opts("topic") == "feed-topic")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
  }
}
