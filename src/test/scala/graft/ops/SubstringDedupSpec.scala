package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** substringDedup (q101 operator) on hand-built frames: first
  * occurrence keeps the span, every later copy loses it, short docs
  * pass untouched, fully-duplicate docs drop. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], k: Int = 3): Map[Long, (String, Long, Long)] =
    TextAnalysis.substringDedup(rows.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("cross-doc repeated span removed from the later doc only") {
    val out = run(Seq(1L -> "a b c d e", 2L -> "x a b c y"))
    assert(out(1L) == (("a b c d e", 5L, 0L)))
    assert(out(2L) == (("x y", 2L, 3L)))
  }

  test("fully-duplicate doc is dropped; doc shorter than k untouched") {
    val out = run(Seq(1L -> "a b c d e", 3L -> "a b c", 4L -> "p q"))
    assert(!out.contains(3L), "doc reduced to zero tokens must drop")
    assert(out(4L) == (("p q", 2L, 0L)))
  }

  test("within-doc repeated window loses its second occurrence") {
    val out = run(Seq(5L -> "m n o z m n o"))
    assert(out(5L) == (("m n o z", 4L, 3L)))
  }

  test("first occurrence is the global (doc_id, pos) minimum") {
    // the span appears in doc 7 before doc 9: doc 7 keeps it
    val out = run(Seq(7L -> "k l m", 9L -> "u k l m w"))
    assert(out(7L) == (("k l m", 3L, 0L)))
    assert(out(9L) == (("u w", 2L, 3L)))
  }

  test("span longer than k disappears wholly from the later copy") {
    // 5-token shared span, k=3 → 3 losing windows cover all 5 tokens
    val out = run(Seq(1L -> "a b c d e", 2L -> "q a b c d e r"))
    assert(out(2L) == (("q r", 2L, 5L)))
  }

  private def runDelta(base: Seq[(Long, String)], delta: Seq[(Long, String)],
      k: Int = 3): Map[Long, (String, Long, Long)] = {
    val idx = TextAnalysis.substringIndex(base.toDF("doc_id", "text"),
      "doc_id", "text", k)
    TextAnalysis.substringDedupDelta(delta.toDF("doc_id", "text"), idx,
      "doc_id", "text", k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("delta vs standing index ≡ batch over base ∪ delta (base ids first)") {
    val base = Seq(1L -> "a b c d e", 2L -> "f g h i")
    val delta = Seq(10L -> "x a b c y f g h", 11L -> "x a b c y z", 12L -> "n e w")
    val incr = runDelta(base, delta)
    val batch = run(base ++ delta).filter(_._1 >= 10L)
    assert(incr == batch)
  }

  test("window seen only within the delta: first delta occurrence keeps it") {
    val out = runDelta(Seq(1L -> "a b c"), Seq(10L -> "p q r s", 11L -> "z p q r"))
    assert(out(10L) == (("p q r s", 4L, 0L)))
    assert(out(11L) == (("z", 1L, 3L)))
  }

  test("index membership alone removes a delta span; fresh text passes") {
    val out = runDelta(Seq(1L -> "a b c d"), Seq(10L -> "u a b c v"))
    assert(out(10L) == (("u v", 2L, 3L)))
  }

  test("bloom-prefiltered delta ≡ direct delta, even under a saturated bloom") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val base = d.filter(col("doc_id") < 25)
    val delta = d.filter(col("doc_id") >= 25)
    val idx = TextAnalysis.substringIndex(base, "doc_id", "text", 8)
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text", "n_kept", "n_removed")
        .as[(Long, String, Long, Long)].collect().toSet
    val direct = collect(TextAnalysis.substringDedupDelta(
      delta, idx, "doc_id", "text", 8))
    val sized = BloomIndex.buildBloom(idx, "fp", 1 << 16, 5)
    assert(collect(TextAnalysis.substringDedupDelta(
      delta, idx, "doc_id", "text", 8, indexBloom = Some(sized))) == direct)
    // 256 bits vs thousands of fps — FP-heavy on purpose; the verify
    // semi-join must still keep results identical
    val tiny = BloomIndex.buildBloom(idx, "fp", 256, 3)
    assert(collect(TextAnalysis.substringDedupDelta(
      delta, idx, "doc_id", "text", 8, indexBloom = Some(tiny))) == direct)
  }

  test("broadcast and shuffle loser-join modes are result-identical") {
    val rows = Seq(1L -> "a b c d e", 2L -> "q a b c d e r",
      3L -> "a b c", 4L -> "fresh words only here").toDF("doc_id", "text")
    def collectMode(bcast: Boolean) =
      TextAnalysis.substringDedup(rows, "doc_id", "text", 3, broadcastLosers = bcast)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(collectMode(true) == collectMode(false))
  }
}
