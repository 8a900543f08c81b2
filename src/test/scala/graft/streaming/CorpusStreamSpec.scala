package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming corpus ingest: quality gate + enrichment + watermarked
  * exact dedup behave identically to their batch counterparts. */
class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  case class Doc(ts: Timestamp, doc_id: Long, text: String)

  private val good =
    "the quick brown fox jumps over the lazy dog and runs to the hills again"
  private val junk = "x$" // fails the quality gate (too few tokens)

  test("streaming clean: gate filters junk, duplicates masked across batches") {
    val in = memStream[Doc]
    val q = CorpusStream.cleanStream(in.toDF(), "text", "ts", "1 minute")
      .writeStream.format("memory").queryName("corpus_clean")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Doc(ts("2026-01-01 00:00:00"), 1L, good),
        Doc(ts("2026-01-01 00:00:01"), 2L, junk))
      q.processAllAvailable()
      // batch 2: byte-identical re-crawl of doc 1 inside the watermark
      in.addData(Doc(ts("2026-01-01 00:00:05"), 3L, good))
      q.processAllAvailable()
      val out = spark.table("corpus_clean")
      assert(out.count() == 1) // junk gated out, re-crawl deduped
      val row = out.select("doc_id", "n_tokens", "lang_id").as[(Long, Int, String)].head()
      assert(row == ((1L, 15, "en")))
    } finally q.stop()
  }

  test("enrich columns equal the batch operators on the same rows") {
    val d = Seq((1L, good), (2L, "el perro de la casa que los una")).toDF("doc_id", "text")
    val e = CorpusStream.enrich(d, "text")
      .select("doc_id", "n_tokens", "quality", "lang_id", "fingerprint")
    val expected = d.select(col("doc_id"),
      graft.functions.TextFunctions.tokenCount(col("text")).as("n_tokens"),
      graft.functions.TextFunctions.qualityScore(col("text")).as("quality"),
      graft.functions.TextFunctions.langId(col("text")).as("lang_id"),
      graft.functions.TextFunctions.fingerprint(col("text")).as("fingerprint"))
    assert(e.exceptAll(expected).isEmpty && expected.exceptAll(e).isEmpty)
  }
}
