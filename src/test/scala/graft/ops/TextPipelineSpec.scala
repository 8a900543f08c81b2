package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the training-pipeline text operators added in round 4:
  * benchmark decontamination, Gopher-style repetition stats, and the
  * deterministic hash split. */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.load(spark, dir, "documents")

  test("contaminationReport counts distinct shared 3-grams; decontaminate drops exactly the flagged docs") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma", "beta gamma delta" → 2
      (2L, "alpha beta gamma beta gamma delta zeta eta theta"), // same 2 distinct shared grams
      (3L, "unrelated words entirely here today")).toDF("doc_id", "text")
    val rep = TextAnalysis.contaminationReport(corpus, bench, "doc_id", "text", n = 3, minShared = 2)
      .as[(Long, Long)].collect().toMap
    assert(rep == Map(1L -> 2L, 2L -> 2L))
    val clean = TextAnalysis.decontaminate(corpus, bench, "doc_id", "text", n = 3, minShared = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(3L))
  }

  test("decontaminate keeps everything when the benchmark is disjoint") {
    val bench = Seq((9L, "zz yy xx ww")).toDF("doc_id", "text")
    val n = TextAnalysis.decontaminate(docs, bench, "doc_id", "text").count()
    assert(n == docs.count())
  }

  test("repetitionStats: exact fractions on hand-built docs, short-doc guard") {
    val d = Seq(
      (1L, "a a a a a a a a a a"),  // 10 tokens, 8 identical 3-grams → dup3 7/8, top 1.0
      (2L, "a b"),                  // <3 tokens → dup3_frac 0 by the guard
      (3L, "w x y z")               // all distinct → dup3 0, top 1/4
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(d, "doc_id", "text")
      .select("doc_id", "n_tokens", "dup3_frac", "top_tok_frac", "repetitive")
      .as[(Long, Long, Double, Double, Boolean)].collect().map(t => t._1 -> t).toMap
    assert(r(1L) == ((1L, 10L, 0.875, 1.0, true)))
    assert(r(2L) == ((2L, 2L, 0.0, 0.5, true)))
    assert(r(3L) == ((3L, 4L, 0.0, 0.25, true)))
  }

  test("repetitionStats flags nothing on the organic corpus below thresholds") {
    // sanity: the flag is the OR of the two documented thresholds
    val r = TextAnalysis.repetitionStats(docs, "doc_id", "text")
    assert(r.filter(col("repetitive") =!=
      (col("dup3_frac") > 0.5 || col("top_tok_frac") > 0.2)).isEmpty)
  }

  test("hashSplit is deterministic, id-stable under repartition, and near the target fraction") {
    val s1 = TextAnalysis.hashSplit(docs, "doc_id", "v1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val s2 = TextAnalysis.hashSplit(docs.repartition(7), "doc_id", "v1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 == s2, "split must be a pure function of (seed, id)")
    val frac = s1.values.count(_ == "train").toDouble / s1.size
    assert(math.abs(frac - 0.8) < 0.1, s"train fraction $frac far from 0.8")
    // different seed → different assignment (with overwhelming probability)
    val s3 = TextAnalysis.hashSplit(docs, "doc_id", "v2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(s1 != s3)
  }
}
