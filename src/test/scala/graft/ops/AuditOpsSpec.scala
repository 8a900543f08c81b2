package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Corpus-audit operator contracts (q179–q181 family): the minhash
  * calibration's sample+cap bounds must be exact recipes (so the
  * oracle can mirror them) and the cap must actually bind on a hot
  * bucket (so a boilerplate cluster can't go quadratic at scale). */
class AuditOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.load(spark, dir, "documents")

  test("minhashCalibration: non-binding bounds reproduce the full spectrum") {
    // with cap = MaxValue and sampleFrac = 1 the bounded form IS the
    // full form; with a generous-but-finite cap on this corpus the
    // spectrum must be unchanged (no bucket is hot enough to bind)
    val full = AuditOps.minhashCalibrationOf(docs)
      .collect().map(_.toSeq).toSeq
    val capped = AuditOps.minhashCalibrationOf(docs,
        sampleFrac = 1.0, bucketCap = 100000)
      .collect().map(_.toSeq).toSeq
    assert(full.nonEmpty && capped == full)
  }

  test("minhashCalibration: hash-stable sample equals calibration of the pre-filtered frame") {
    // the sampleFrac parameter must be EXACTLY the q66 md5 recipe —
    // applying the same filter externally and calibrating unsampled
    // reproduces the sampled spectrum bit-for-bit
    val sampled = AuditOps.minhashCalibrationOf(docs, sampleFrac = 0.5)
      .collect().map(_.toSeq).toSeq
    val pre = docs.filter(
      substring(md5(concat(lit("cal|"), col("doc_id").cast("string"))), 1, 4)
        < lit("8000"))
    val external = AuditOps.minhashCalibrationOf(pre)
      .collect().map(_.toSeq).toSeq
    assert(sampled.nonEmpty && sampled == external)
  }

  test("lshCandidatesBucketDropped: drops hot buckets, all-pairs under the cap") {
    // 40 near-identical boilerplate docs (one shared bigram set → one
    // hot bucket per band) + 2 distinct near-dups that should survive
    val boiler = (1L to 40L).map(i => (i, "the same boilerplate page text here"))
    val pair = Seq((101L, "unique alpha beta gamma delta"),
                   (102L, "unique alpha beta gamma delta"))
    val d = (boiler ++ pair).toDF("doc_id", "text")
    val bands = Dedup.lshBandsFromArrays(
      Dedup.docShingleArrays(Dedup.wordBigrams(d, "doc_id", "text")), 8, 2)
    val capped = Dedup.lshCandidatesBucketDropped(bands, 8)
      .as[(Long, Long)].collect().toSet
    // the 40-member bucket (780 pairs/band) is dropped entirely …
    assert(capped == Set((101L, 102L)), s"got $capped")
    // … while the uncapped form keeps it (and nothing else differs)
    val full = Dedup.lshCandidates(bands).as[(Long, Long)].collect().toSet
    assert(full.size == 780 + 1)
    // non-binding cap ≡ uncapped
    val loose = Dedup.lshCandidatesBucketDropped(bands, 1000)
      .as[(Long, Long)].collect().toSet
    assert(loose == full)
  }

  test("minhashCalibration: bucketCap bounds the pair spectrum on a hot cluster") {
    val boiler = (1L to 40L).map(i => (i, "the same boilerplate page text here"))
    val pair = Seq((101L, "unique alpha beta gamma delta"),
                   (102L, "unique alpha beta gamma delta"))
    val d = (boiler ++ pair).toDF("doc_id", "text")
    val cappedPairs = AuditOps.minhashCalibrationOf(d, bucketCap = 8)
      .agg(sum("n_pairs")).as[Long].head()
    val fullPairs = AuditOps.minhashCalibrationOf(d)
      .agg(sum("n_pairs")).as[Long].head()
    assert(cappedPairs == 1L, s"capped=$cappedPairs")
    assert(fullPairs == 781L, s"full=$fullPairs")
  }

  test("paddingWasteOf excludes zero-word docs (empty split yields [''], not 1 token)") {
    // "" and "   " must not count as 1-token docs — round-11 fix
    // aligning with the length(trim)=0 guard the other audits use
    val d = Seq("a b c", "", "   ").toDF("text")
    val got = AuditOps.paddingWasteOf(d)
      .select("ctx", "n_docs", "n_seqs", "n_pad")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toList
    assert(got == List(
      (64L, 1L, 1L, 61L), (128L, 1L, 1L, 125L),
      (256L, 1L, 1L, 253L), (512L, 1L, 1L, 509L)))
  }
}
