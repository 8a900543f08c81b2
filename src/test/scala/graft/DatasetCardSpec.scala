package graft

import org.apache.spark.sql.functions._
import graft.tools.DatasetCard

/** The dataset card's release-gate sections (round-7 additions): each
  * summary is the certified operator's rollup, so plant the signals
  * the q87/q89/q92 gates plant and assert the card surfaces them. */
class DatasetCardSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "plain words only here nothing sensitive at all today"),
    (2L, "mail me at a.b@example.org and card 4111111111111111 thanks"),
    (3L, "call 555-0142 soon or mail c.d@example.org please"),
    (4L, "see https://blog.example.org/a and https://www.data.example.net/b"),
    (5L, "also https://blog.example.org/c appears twice here")
  ).toDF("doc_id", "text")

  test("piiSummary counts flagged docs and finds per kind") {
    val r = DatasetCard.piiSummary(base, "doc_id", "text").head()
    assert(r.getAs[Long]("n_docs") == 5L)
    assert(r.getAs[Long]("n_docs_with_pii") == 2L)
    assert(r.getAs[Long]("n_emails") == 2L)
    assert(r.getAs[Long]("n_cards_valid") == 1L)
    assert(r.getAs[Long]("n_phones") == 1L)
  }

  test("boilerplateSummary reports spans over the doc-frequency floor") {
    val tailed = base.select(col("doc_id"),
      concat(col("text"), lit(" all rights reserved today")).as("text"))
    val r = DatasetCard.boilerplateSummary(tailed, "doc_id", "text", n = 3, minDocs = 5).head()
    // every doc carries the 4-token tail → 2 shared 3-grams at df=5,
    // each occurring once per doc
    assert(r.getAs[Long]("n_spans") == 2L)
    assert(r.getAs[Long]("n_occurrences") == 10L)
    assert(r.getAs[Long]("max_span_docs") == 5L)
    val clean = DatasetCard.boilerplateSummary(base, "doc_id", "text", n = 3, minDocs = 5).head()
    assert(clean.getAs[Long]("n_spans") == 0L) // empty-report aggregate is 0s, not nulls
  }

  test("hostSummary ranks hosts with www stripped") {
    val got = DatasetCard.hostSummary(base, "doc_id", "text")
      .as[(String, Long, Long)].collect().toList
    assert(got.head == (("blog.example.org", 2L, 2L)))
    assert(got.map(_._1).contains("data.example.net")) // www. stripped
  }

  test("substringDupSummary surfaces planted verbatim duplication") {
    // doc 11 repeats doc 10's 5-token span (k=3): 5 tokens removable;
    // doc 12 is entirely a copy of doc 10 → dropped
    val dup = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "intro alpha beta gamma delta epsilon outro"),
      (12L, "alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")
    val r = DatasetCard.substringDupSummary(dup, "doc_id", "text", k = 3).head()
    assert(r.getAs[Long]("tokens_kept") == 5L + 2L)
    // includes the 5 tokens of the fully-dropped doc 12
    assert(r.getAs[Long]("tokens_removed") == 5L + 5L)
    assert(r.getAs[Long]("docs_kept") == 2L)
    assert(r.getAs[Long]("docs_dropped") == 1L)
  }

  test("sourceOverlapSummary ranks the most-overlapping source pair first") {
    import spark.implicits._
    val docs = Seq(
      ("m1", "the quick brown fox jumps"), ("m2", "the quick brown fox jumps"),
      ("m3", "something else entirely here"), ("m1", "shared tail phrase"),
      ("m3", "shared tail phrase"))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, t, s) }
      .toDF("doc_id", "text", "source")
    val top = graft.tools.DatasetCard.sourceOverlapSummary(docs).collect()
    // m1/m2 are verbatim mirrors on one doc -> highest jaccard
    assert(top.head.getString(0) == "m1" && top.head.getString(1) == "m2")
    assert(top.head.getLong(5) > top.last.getLong(5) || top.length == 1)
  }

  test("lowEntropySummary surfaces the degenerate source first") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x x x x x", "degenerate"),
      (2L, "a b c d e f g h", "diverse"))
      .toDF("doc_id", "text", "source")
    val top = graft.tools.DatasetCard.lowEntropySummary(docs).collect()
    assert(top.head.getString(0) == "degenerate")
    assert(top.head.getDouble(3) == 0.0)
  }

  test("memorizationSummary surfaces the planted cross-doc span") {
    import spark.implicits._
    val span = "one two three four five six seven eight"
    val docs = Seq(
      (1L, s"$span alpha beta", "s1"),
      (2L, s"gamma $span", "s2"),
      (3L, "totally different text with no repeats at all ok", "s3"))
      .toDF("doc_id", "text", "source")
    val top = graft.tools.DatasetCard
      .memorizationSummary(docs, "doc_id", "source", "text").collect()
    assert(top.head.getString(0) == span)
    assert(top.head.getLong(1) == 2L && top.head.getLong(2) == 2L)
  }

  test("hapaxSummary floats the most-templated source to the top") {
    import spark.implicits._
    val docs = Seq(
      ("templated", "spam spam spam spam eggs eggs"), // 0 hapax of 2 distinct
      ("novel", "every single token here is unique honestly"))
      .toDF("source", "text")
    val got = graft.tools.DatasetCard.hapaxSummary(docs).collect()
    assert(got.head.getString(0) == "templated")
    assert(got.head.getAs[Long]("hapax_share_fx") == 0L)
    assert(got.last.getString(0) == "novel")
    assert(got.last.getAs[Long]("hapax_share_fx") == 1000000L)
  }

  test("calibrationSummary: planted exact dup lands in the hamming-0 bucket at Jaccard 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "completely unrelated words about some other topic entirely"))
      .toDF("doc_id", "text")
    val byHam = graft.tools.DatasetCard.calibrationSummary(docs).collect()
      .map(r => r.getAs[Long]("hamming") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("min_jaccard_fx"),
          r.getAs[Long]("max_jaccard_fx"))).toMap
    assert(byHam(0L) == ((1L, 1000000L, 1000000L)))
  }

  test("vocabHealthSummary reports final totals plus the Zipf slope") {
    import spark.implicits._
    val words = (1 to 4).flatMap(r => Seq.fill(12 / r)(s"w$r")) // 12,6,4,3
    val docs = (1L to 5L).map(i => (i, words.mkString(" "))).toDF("doc_id", "text")
    val r = graft.tools.DatasetCard.vocabHealthSummary(docs, "text").collect().head
    assert(r.getAs[Long]("tokens_cum") == 125L) // 25 tokens x 5 docs
    assert(r.getAs[Long]("vocab_cum") == 4L)
    assert(r.getAs[Long]("slope_fx") < -800000L) // steep negative power law
  }
}
