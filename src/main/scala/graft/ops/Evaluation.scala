package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Model-evaluation surface: the metrics a training-data pipeline
  * computes over a scored corpus before shipping a model or a filter
  * — exact ROC-AUC (Mann–Whitney rank form, tie-corrected) and the
  * calibration/reliability table. Both run entirely on integer
  * fixed-point arithmetic so the gate hash is partition-order free
  * (see .claude/skills/verify gotchas).
  *
  * Scale contract: neither metric ever sorts the corpus. Scores are
  * quantized and grouped FIRST (one map-side-combined aggregation),
  * so the rank window runs over the distinct-score frame — bounded
  * by the quantization grid, not the row count. At 100 TB a coarser
  * grid (1e-4) keeps that frame in one executor; the row-level pass
  * stays a single scan + shuffle-by-score.
  */
object Evaluation {

  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  /** Quantized score + binary label off the embeddings table: the
    * score is the first embedding component (a stand-in for any
    * model score), positive class = label < 5. float32 → DOUBLE cast
    * is exact; 1e-6 quantization matches the oracle bit-for-bit. */
  private def scored(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(
      round(element_at(col("embedding"), 1).cast("double") * 1e6)
        .cast("long").as("score_fx"),
      (col("label") < 5).cast("long").as("pos"))

  private val scoredSql: String =
    """SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS score_fx,
      |    CASE WHEN label < 5 THEN 1 ELSE 0 END AS pos FROM embeddings""".stripMargin

  /** Exact ROC-AUC via the Mann–Whitney U statistic with average-rank
    * tie correction: AUC = (Σ_pos avgrank − n⁺(n⁺+1)/2) / (n⁺·n⁻).
    * Ranks are DOUBLED (`r2 = 2·cum_before + n + 1`) so tied-group
    * average ranks stay integral — the whole computation is exact
    * BIGINT until one final integer division to 1e-6 fixed point.
    * The rank window is over the grouped distinct-score frame (see
    * object doc); nothing row-sized is globally ordered. BIGINT
    * headroom: Σ n_pos·r2 ≲ 2·n⁺·N — overflows past N≈3e9 rows;
    * beyond that swap the two sums to DECIMAL(38,0). */
  def scoreAuc(s: SparkSession, dir: String): DataFrame = aucOf(scored(s, dir))

  /** Generic core over any (score_fx BIGINT, pos 0/1 BIGINT) frame. */
  def aucOf(scoredDf: DataFrame): DataFrame = {
    val byScore = scoredDf
      .groupBy(col("score_fx"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    val w = Window.orderBy(col("score_fx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cum_before", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("r2", lit(2L) * col("cum_before") + col("n") + lit(1L))
      .agg(sum(col("n_pos") * col("r2")).as("s2"),
        sum(col("n_pos")).as("np"),
        sum(col("n") - col("n_pos")).as("nn"))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        expr("((s2 - np * (np + 1)) * 1000000) div (2 * np * nn)").as("auc_fx"))
  }

  val scoreAucSql: String =
    s"""WITH e AS ($scoredSql),
       |g AS (SELECT score_fx, count(*) AS n, sum(pos) AS n_pos FROM e GROUP BY 1),
       |r AS (SELECT score_fx, n, n_pos,
       |    coalesce(sum(n) OVER (ORDER BY score_fx
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
       |  FROM g),
       |t AS (SELECT sum(n_pos * (2 * cum_before + n + 1)) AS s2,
       |    sum(n_pos) AS np, sum(n - n_pos) AS nn FROM r)
       |SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       |  CAST(((s2 - np * (np + 1)) * 1000000) // (2 * np * nn) AS BIGINT) AS auc_fx
       |FROM t""".stripMargin

  /** Calibration / reliability table: 10 equal-width score bins, per
    * bin the row count, positive count, positive rate (1e-6 fixed
    * point) and mean score RELATIVE to the global minimum (keeps the
    * summed numerator non-negative, so truncating integer division is
    * unambiguous). Bin assignment is the exact integer form
    * `(score−lo)·10 div (hi−lo+1)` — lands in 0..9 by construction,
    * no float boundary can flip a row's bin. The [lo,hi] extent is a
    * 1-row broadcast; the whole op is two aggregations. */
  def calibrationBins(s: SparkSession, dir: String): DataFrame =
    calibrationOf(scored(s, dir))

  /** Generic core over any (score_fx BIGINT, pos 0/1 BIGINT) frame. */
  def calibrationOf(e: DataFrame): DataFrame = {
    val ext = e.agg(min(col("score_fx")).as("lo"), max(col("score_fx")).as("hi"))
    e.crossJoin(broadcast(ext))
      .withColumn("bin", expr("((score_fx - lo) * 10) div (hi - lo + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("score_fx") - col("lo")).as("rel_sum"),
        first(col("lo")).as("lo_fx"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("(n_pos * 1000000) div n").as("pos_rate_fx"),
        expr("rel_sum div n").as("avg_rel_fx"), col("lo_fx"))
      .orderBy(col("bin"))
  }

  val calibrationBinsSql: String =
    s"""WITH e AS ($scoredSql),
       |x AS (SELECT min(score_fx) AS lo, max(score_fx) AS hi FROM e),
       |b AS (SELECT ((score_fx - lo) * 10) // (hi - lo + 1) AS bin,
       |    pos, score_fx - lo AS rel, lo FROM e, x)
       |SELECT bin, count(*) AS n, CAST(sum(pos) AS BIGINT) AS n_pos,
       |  CAST((sum(pos) * 1000000) // count(*) AS BIGINT) AS pos_rate_fx,
       |  CAST(sum(rel) // count(*) AS BIGINT) AS avg_rel_fx,
       |  CAST(min(lo) AS BIGINT) AS lo_fx
       |FROM b GROUP BY 1 ORDER BY bin""".stripMargin

  /** q191 — best-of-k yield (the pass@k estimator of Chen et al.
    * 2021's HumanEval, applied to rejection-sampled data generation):
    * per source, with n samples of which c clear the q187 quality
    * screen, the probability that at least one of k uniformly drawn
    * samples passes — pass@k = 1 − C(n−c,k)/C(n,k) — for k ∈
    * {1, 5, 10}. This is the number that sizes a synthetic-data run:
    * how many generations per prompt before the screen yields a
    * keeper.
    *
    * Determinism: the combinatorial ratio is evaluated as the
    * left-to-right product Π (n−c−i)/(n−i) — each factor an exact-
    * integer ratio, the fold order identical in both engines (Spark
    * `aggregate` is a left fold; DuckDB `list_product` reduces in
    * list order; multiplying the 1.0 seed is IEEE-exact), so the
    * double product is bit-identical and the final 1e-6 rounding
    * can't diverge. The ratio form never overflows (the raw C(n,k)
    * explodes past BIGINT at n ≈ 25k already). When n−c < k a factor
    * is exactly 0 and pass@k = 1 exactly. Shape: the per-doc flags
    * are map-only (q187's kernel), one source aggregate, then a
    * 3×|sources| frame — nothing after the first reduce is
    * corpus-sized. */
  def passAtK(s: SparkSession, dir: String): DataFrame =
    passAtKOf(Tables.load(s, dir, "documents"))

  /** Generic pass@k core over any (source, text) frame. */
  def passAtKOf(docsDf: DataFrame): DataFrame =
    passScreenCounts(docsDf)
      .select(col("source"), col("n"), col("c"),
        explode(array(lit(1), lit(5), lit(10))).as("k"))
      .filter(col("k") <= col("n"))
      .transform(passAtKClose)
      .orderBy(col("source"), col("k"))

  /** Best-of-k yield with k CLAMPED per source to min(k, n): every
    * source gets exactly one row — a 2-doc source reports its
    * best-of-2 yield instead of silently vanishing from the k=5 slice
    * (round-11, ADVICE r10 #3; tiny sources are exactly the ones most
    * likely to have the worst yield). The emitted k column shows the
    * clamp, so a reader can tell best-of-5 from best-of-n<5. */
  def bestOfK(docsDf: DataFrame, k: Int): DataFrame =
    passScreenCounts(docsDf)
      .withColumn("k", least(lit(k.toLong), col("n")))
      .transform(passAtKClose)

  private def passScreenCounts(docsDf: DataFrame): DataFrame =
    CurationOps.qualityRuleFlags(docsDf, "source", "text")
      .groupBy(col("source")).agg(count(lit(1)).as("n"),
        sum(when(col("r1") && col("r2") && col("r3") && col("r4"), 1L)
          .otherwise(0L)).as("c"))

  private def passAtKClose(g: DataFrame): DataFrame =
    g.withColumn("prod", aggregate(sequence(lit(0), col("k") - 1), lit(1.0d),
        (acc, i) => acc * ((col("n") - col("c") - i).cast("double") /
          (col("n") - i).cast("double"))))
      .select(col("source"), col("k").cast("long").as("k"),
        col("n").as("n_samples"), col("c").as("n_pass"),
        round((lit(1.0d) - col("prod")) * 1e6).cast("long").as("pass_at_k_fx"))

  val passAtKSql: String =
    s"""WITH ${CurationOps.qualityPassCteSql},
       |g AS (SELECT source, count(*) AS n, sum(pass) AS c
       |  FROM qpass GROUP BY source),
       |x AS (SELECT source, n, CAST(c AS BIGINT) AS c, k
       |  FROM g CROSS JOIN (SELECT unnest([1, 5, 10]) AS k) WHERE k <= n),
       |p AS (SELECT source, k, n, c,
       |    list_product(list_transform(generate_series(0, k - 1),
       |      i -> CAST(n - c - i AS DOUBLE) / CAST(n - i AS DOUBLE))) AS prod
       |  FROM x)
       |SELECT source, CAST(k AS BIGINT) AS k, n AS n_samples, c AS n_pass,
       |  CAST(round((1 - prod) * 1e6) AS BIGINT) AS pass_at_k_fx
       |FROM p ORDER BY source, k""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_score_auc" -> scoreAuc,
    "q160_calibration_bins" -> calibrationBins,
    "q191_pass_at_k" -> passAtK)

  val oracles: Map[String, String] = Map(
    "q159_score_auc" -> scoreAucSql,
    "q160_calibration_bins" -> calibrationBinsSql,
    "q191_pass_at_k" -> passAtKSql)
}
