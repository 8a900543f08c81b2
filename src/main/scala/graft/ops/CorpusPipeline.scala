package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** The end-to-end training-data cleaning pipeline — the composition a
  * corpus job actually ships: quality gate → exact dedup → near-dup
  * collapse, each stage the already-certified operator, wired so the
  * whole thing is ONE oracle-checkable dataflow (q59).
  *
  * Stage plan (and its 100 TB shape):
  *   1. quality filter — map-only, runs at the scan (token/score
  *      predicates push no shuffle);
  *   2. exact dedup — one shuffle keyed on md5(text), keep min id per
  *      fingerprint (removes byte-identical copies before the
  *      shingling pays for them);
  *   3. near-dup — MinHash+LSH with the star-capped candidate join
  *      (`minhashDedupCapped`): one heavy shuffle for per-doc shingle
  *      arrays, map-side band keys, capped bucket join, exact-Jaccard
  *      verification of candidates only;
  *   4. collapse — connected components over the verified pairs
  *      (driver union-find at pair counts that fit, distributed label
  *      propagation above), survivors = min id per component, one
  *      broadcast anti-join over the corpus.
  */
object CorpusPipeline {

  final case class Config(
      minTokens: Int = 5,
      minQuality: Double = 0.3,
      numHashes: Int = 8,
      bandSize: Int = 2,
      minJaccard: Double = 0.5,
      maxBucket: Int = 10000)

  /** Quality-gate predicate (stage 1), exposed for reuse/testing. */
  def qualityGate(textCol: Column, cfg: Config): Column =
    TextFunctions.tokenCount(textCol) >= cfg.minTokens &&
      TextFunctions.qualityScore(textCol) >= cfg.minQuality

  /** Exact-dedup survivors (stage 2): min id per content fingerprint.
    * Window-min instead of groupBy+join: one shuffle on the
    * fingerprint, no second pass over the corpus. */
  def exactSurvivors(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_fp_min", min(col(idCol)).over(
        Window.partitionBy(TextFunctions.fingerprint(col(textCol)))))
      .filter(col(idCol) === col("_fp_min"))
      .drop("_fp_min")

  /** Knobs for the stages `trainingRecipe` adds on top of `clean`.
    * Decontamination uses 6-gram/minShared=1 ("any shared 6-gram is
    * leakage") — n-gram length is the lever that separates genuine
    * benchmark overlap from short-gram vocabulary noise. */
  final case class RecipeConfig(
      base: Config = Config(),
      maxDup3Frac: Double = 0.5,
      maxTopTokFrac: Double = 0.2,
      decontamN: Int = 6,
      decontamMinShared: Long = 1,
      splitSeed: String = "v1",
      trainFrac: Double = 0.8)

  /** The COMPLETE modern training-data recipe, every stage the
    * already-certified operator, composed as one dataflow (q69):
    *
    *   quality gate → repetition filter (Gopher) → benchmark
    *   decontamination → exact dedup → near-dup collapse (capped LSH)
    *   → deterministic train/val split.
    *
    * Stage shape at 100 TB: stages 1–2 are map-only predicates fused
    * into the scan projection; decontamination broadcasts the
    * benchmark gram set (benchmarks are tiny by definition) so the
    * corpus still hasn't shuffled; then the dedup stages run exactly
    * as in `clean`. The split is a map-only pure function of
    * (seed, id) stamped on the survivors. */
  def trainingRecipe(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      cfg: RecipeConfig = RecipeConfig()): DataFrame = {
    // decontaminate references the gated frame twice (gram side +
    // anti-join side) — persist so the two filter stages run once.
    val gated = docs.filter(
      qualityGate(col(textCol), cfg.base) &&
        !TextAnalysis.repetitiveFlag(col(textCol), cfg.maxDup3Frac, cfg.maxTopTokFrac))
      .persist()
    val decon = TextAnalysis.decontaminate(gated, benchmark, idCol, textCol,
      cfg.decontamN, cfg.decontamMinShared)
    val ex = exactSurvivors(decon, idCol, textCol).persist()
    val pairs = Dedup.minhashDedupCapped(ex, idCol, textCol,
      cfg.base.numHashes, cfg.base.bandSize, cfg.base.minJaccard, cfg.base.maxBucket)
    TextAnalysis.hashSplit(Dedup.dedupCorpus(ex, idCol, pairs),
      idCol, cfg.splitSeed, cfg.trainFrac)
  }

  /** The full pipeline: returns the cleaned, deduplicated corpus
    * (all original columns of the surviving rows). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val gated = docs.filter(qualityGate(col(textCol), cfg))
    // The exact-dedup output feeds both the LSH pipeline and the final
    // collapse anti-join — persist so the corpus is scanned once.
    val ex = exactSurvivors(gated, idCol, textCol).persist()
    val pairs = Dedup.minhashDedupCapped(ex, idCol, textCol,
      cfg.numHashes, cfg.bandSize, cfg.minJaccard, cfg.maxBucket)
    val out = Dedup.dedupCorpus(ex, idCol, pairs)
    // Result is small relative to intermediates only in pathological
    // corpora; here survivors ≈ corpus size, so hand back a lazy plan
    // over the persisted `ex` and let the caller decide materialization
    // (the gate query orders + dumps it immediately).
    out
  }
}
