package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Round-11 corpus-statistics operators (q194–q201): the planning /
  * drift / attribution numbers a curation team reads BETWEEN pipeline
  * runs — held-out cross-entropy under the train split's LM,
  * crawl-order novelty attribution, distribution-drift KS distance,
  * exact proportional stratified sampling, embedding-space label
  * similarity, adjacent-repetition runs, feed-side cohort
  * retention, and the release gate that turns the audit battery into
  * one pass/fail checklist. Every operator is oracle-gated; every
  * float touchpoint
  * uses the fixed-point recipes the earlier gates certified (per-row
  * `round(ln·1e9)` longs for logs, exact-integer sums widened to
  * DECIMAL(38)/HUGEINT before any product that could wrap, doubles
  * only for final correctly-rounded sqrt/div of exact integers). */
object CorpusStats {
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  private val WS = "\\s+"

  /** q66's split stamp: md5("v1|"+id) 4-hex prefix < 'cccc' → train. */
  private def isTrain(id: Column): Column =
    substring(md5(concat(lit("v1|"), id.cast("string"))), 1, 4) < "cccc"

  // ---------------------------------------------------------------
  // q194 — held-out cross-entropy under the train-split unigram LM
  // ---------------------------------------------------------------

  /** Per-source cross-entropy of the VAL split under an add-one-
    * smoothed unigram LM fit on the TRAIN split (q66's hash split) —
    * the cheap leakage/shift detector: a source whose val slice
    * scores far below the corpus line is suspiciously predictable
    * (duplication across the split boundary); far above means the
    * split is not exchangeable for that source. p(t) =
    * (c_t+1)/(N+V+1) with one OOV bucket; per val token −ln p.
    *
    * Determinism (the q128 entropy recipe): each token TYPE's
    * −ln p is fixed-pointed once (`round(ln·1e9)` BIGINT), weighted
    * by its exact val count, summed as integers; the per-source
    * cross-entropy is emitted as `xent_fx`, the exact TRUNCATING
    * integer division sum(hfx) div sum(cv) — a 1e-9 fixed point
    * (round-12 ADVICE: the earlier `round(double, 6)` output could
    * flake on a decimal-tie quotient because Spark rounds via
    * BigDecimal HALF_UP while DuckDB rounds in floating point; both
    * summands are non-negative so `div` and `//` agree). Scale shape: LM
    * and val counts are token-TYPE tables (vocabulary-bounded, not
    * corpus-bounded) built by ONE (tok) shuffle each; the join is
    * type-table × type-table on tok; N/V ride a 1-row broadcast. */
  def valCrossEntropyOf(d: DataFrame): DataFrame = {
    val toks = d.select(isTrain(col("doc_id")).as("tr"), col("source"),
        explode(split(trim(col("text")), WS)).as("tok"))
      .filter(col("tok") =!= "")
    val lm = toks.filter(col("tr")).groupBy(col("tok"))
      .agg(count(lit(1)).as("ct"))
    val nv = lm.agg(sum(col("ct")).as("n_lm"), count(lit(1)).as("v_lm"))
    val valCnt = toks.filter(!col("tr"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("cv"))
    valCnt
      .join(lm, Seq("tok"), "left")
      .crossJoin(broadcast(nv))
      .withColumn("hfx", col("cv") * round(
        log((col("n_lm") + col("v_lm") + lit(1L)).cast("double") /
          (coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double")) * 1e9)
        .cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("cv")).as("n_tokens"),
        sum(when(col("ct").isNull, col("cv")).otherwise(0L)).as("n_oov"),
        expr("sum(hfx) div sum(cv)").as("xent_fx"))
      .select(col("source"), col("n_tokens"), col("n_oov"), col("xent_fx"))
      .orderBy(col("source"))
  }

  def valCrossEntropy(s: SparkSession, dir: String): DataFrame =
    valCrossEntropyOf(docs(s, dir))

  val valCrossEntropySql: String =
    s"""WITH sp AS (SELECT source, text,
       |    substr(md5('v1|' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' AS tr
       |  FROM documents),
       |tk AS (SELECT source, tr,
       |    unnest(string_split_regex(trim(text), '$WS')) AS tok FROM sp),
       |lm AS (SELECT tok, count(*) AS ct FROM tk WHERE tr AND tok <> '' GROUP BY 1),
       |nv AS (SELECT CAST(sum(ct) AS BIGINT) AS n_lm, count(*) AS v_lm FROM lm),
       |vc AS (SELECT source, tok, count(*) AS cv FROM tk
       |  WHERE NOT tr AND tok <> '' GROUP BY 1, 2),
       |h AS (SELECT source, cv, ct,
       |    cv * CAST(round(ln(CAST(n_lm + v_lm + 1 AS DOUBLE)
       |      / (coalesce(ct, 0) + 1)) * 1e9) AS BIGINT) AS hfx
       |  FROM vc LEFT JOIN lm USING (tok) CROSS JOIN nv)
       |SELECT source, CAST(sum(cv) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN ct IS NULL THEN cv ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(sum(hfx) // sum(cv) AS BIGINT) AS xent_fx
       |FROM h GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // q195 — crawl-order bigram novelty attribution per source
  // ---------------------------------------------------------------

  /** Which source is still CONTRIBUTING new text, in crawl order: per
    * source, its distinct word-bigram types, how many of those types
    * FIRST appeared (min doc_id corpus-wide) in one of its own docs,
    * and the first-appearance share — the marginal-novelty companion
    * to q192's Chao1 (that one asks "how much is unseen", this one
    * asks "who has been finding it"). Exact integers throughout.
    * Scale shape: everything keys on the bigram — one distinct
    * (gram, doc) shuffle feeds both the per-gram min and the
    * per-source type counts; the min-doc → source attribution is a
    * join on the doc key, gram-type-bounded rows. */
  def bigramNoveltyOf(d: DataFrame): DataFrame = {
    val grams = d
      .select(col("doc_id"), col("source"), split(trim(col("text")), WS).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("doc_id"), col("source"), explode(expr(
        "transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"))
        .as("gram"))
      .distinct()
    val gramsCk = graft.PlanCapture.checkpoint(grams, "novelty-grams")
    val firstDoc = gramsCk.groupBy(col("gram")).agg(min(col("doc_id")).as("first_doc"))
    val firstSrc = firstDoc.join(
      d.select(col("doc_id").as("first_doc"), col("source").as("first_source")),
      Seq("first_doc"))
    val nFirst = firstSrc.groupBy(col("first_source").as("source"))
      .agg(count(lit(1)).as("n_first"))
    val nTypes = gramsCk.select(col("source"), col("gram")).distinct()
      .groupBy(col("source")).agg(count(lit(1)).as("n_types"))
    nTypes.join(nFirst, Seq("source"), "left")
      .select(col("source"), col("n_types"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        expr("(coalesce(n_first, 0) * 1000000) div n_types").as("novelty_fx"))
      .orderBy(col("source"))
  }

  def bigramNovelty(s: SparkSession, dir: String): DataFrame =
    bigramNoveltyOf(docs(s, dir))

  val bigramNoveltySql: String =
    s"""WITH toks AS (SELECT doc_id, source,
       |    string_split_regex(trim(text), '$WS') AS ts FROM documents),
       |pos AS (SELECT doc_id, source, ts,
       |    unnest(generate_series(1, len(ts) - 1)) AS i
       |  FROM toks WHERE len(ts) >= 2),
       |g AS (SELECT DISTINCT doc_id, source, ts[i] || ' ' || ts[i+1] AS gram FROM pos),
       |fd AS (SELECT gram, min(doc_id) AS first_doc FROM g GROUP BY 1),
       |fs AS (SELECT fd.gram, d.source AS first_source
       |  FROM fd JOIN documents d ON d.doc_id = fd.first_doc),
       |nf AS (SELECT first_source AS source, count(*) AS n_first FROM fs GROUP BY 1),
       |nt AS (SELECT source, count(DISTINCT gram) AS n_types FROM g GROUP BY 1)
       |SELECT nt.source, nt.n_types,
       |  CAST(coalesce(nf.n_first, 0) AS BIGINT) AS n_first,
       |  CAST((coalesce(nf.n_first, 0) * 1000000) // nt.n_types AS BIGINT) AS novelty_fx
       |FROM nt LEFT JOIN nf ON nf.source = nt.source
       |ORDER BY nt.source""".stripMargin

  // ---------------------------------------------------------------
  // q196 — Kolmogorov–Smirnov drift between two sources' lengths
  // ---------------------------------------------------------------

  /** Two-sample KS distance between the doc token-length
    * distributions of two sources — the drift gate a pipeline runs
    * when a crawl refresh lands ("does src0's new batch still LOOK
    * like src0?"). KS = max |ECDF_a − ECDF_b| over the pooled
    * support, each ECDF in exact truncating 1e-6 fixed point, so the
    * statistic is an exact integer and the gate hash can't drift.
    * Scale shape: per-doc lengths are map-side; the support table is
    * |distinct lengths| (bounded ≪ corpus); the cumulative window
    * over it is the documented bounded-global-window pattern. */
  def lengthKsOf(d: DataFrame, srcA: String, srcB: String): DataFrame = {
    val lens = d.filter(col("source").isin(srcA, srcB))
      .select(col("source"),
        when(length(trim(col("text"))) === 0, 0L)
          .otherwise(size(split(trim(col("text")), WS)).cast("long")).as("n"))
    val byN = lens.groupBy(col("n")).agg(
      sum(when(col("source") === srcA, 1L).otherwise(0L)).as("ca"),
      sum(when(col("source") === srcB, 1L).otherwise(0L)).as("cb"))
    val w = Window.orderBy(col("n"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byN
      .withColumn("cca", sum(col("ca")).over(w))
      .withColumn("ccb", sum(col("cb")).over(w))
      .crossJoin(broadcast(lens.agg(
        sum(when(col("source") === srcA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("source") === srcB, 1L).otherwise(0L)).as("n_b"))))
      .select(col("n_a"), col("n_b"),
        // zero guard (round-12 ADVICE): this drift gate exists for the
        // "source vanished in the refresh" case, so an empty side must
        // REPORT maximal drift (sentinel 1e6 = KS distance 1.0), not
        // raise ANSI/DuckDB divide-by-zero. CASE short-circuits on
        // both engines, so the div never evaluates on the guarded row.
        when(col("n_a") === 0 || col("n_b") === 0, lit(1000000L))
          .otherwise(
            abs(expr("(cca * 1000000) div n_a") - expr("(ccb * 1000000) div n_b")))
          .as("d_fx"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(max(col("d_fx")).as("ks_fx"))
  }

  def lengthKs(s: SparkSession, dir: String): DataFrame =
    lengthKsOf(docs(s, dir), "src0", "src1")

  val lengthKsSql: String =
    s"""WITH lens AS (SELECT source,
       |    CASE WHEN length(trim(text)) = 0 THEN 0
       |         ELSE len(string_split_regex(trim(text), '$WS')) END AS n
       |  FROM documents WHERE source IN ('src0', 'src1')),
       |byn AS (SELECT n,
       |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
       |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS cb
       |  FROM lens GROUP BY 1),
       |tot AS (SELECT
       |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
       |  FROM lens),
       |cum AS (SELECT n,
       |    CAST(sum(ca) OVER (ORDER BY n
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cca,
       |    CAST(sum(cb) OVER (ORDER BY n
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ccb
       |  FROM byn)
       |SELECT n_a, n_b,
       |  CAST(max(CASE WHEN n_a = 0 OR n_b = 0 THEN 1000000
       |    ELSE abs((cca * 1000000) // n_a - (ccb * 1000000) // n_b) END)
       |    AS BIGINT) AS ks_fx
       |FROM cum CROSS JOIN tot GROUP BY n_a, n_b""".stripMargin

  // ---------------------------------------------------------------
  // q197 — exact proportional stratified sample (largest remainder)
  // ---------------------------------------------------------------

  /** Deterministic stratified sample hitting the requested total
    * EXACTLY under proportional allocation: per-stratum quotas by the
    * largest-remainder method (floor the proportional share, then
    * hand the leftover seats to the largest fractional remainders;
    * ties break on the stratum key), members picked by the q67
    * hash-rank recipe (md5(seed|id) — reproducible under any
    * partitioning, stable as the corpus grows). The q67 balanced
    * sampler caps every stratum at the SAME k; this one preserves the
    * corpus mix — the two ends of the sampling spectrum. When
    * `total` exceeds the corpus the allocation degrades gracefully
    * (every stratum capped at its size). Scale shape: the allocation
    * table is |strata| rows (bounded global window — the documented
    * pattern); the pick is one per-stratum window over hash ranks. */
  def stratifiedSampleOf(d: DataFrame, idCol: String, stratCol: String,
      total: Long, seed: String): DataFrame = {
    val cnt = d.groupBy(col(stratCol).as("stratum"))
      .agg(count(lit(1)).as("n_s"))
      .crossJoin(broadcast(d.agg(count(lit(1)).as("n_tot"))))
      .withColumn("base", expr(s"(n_s * $total) div n_tot"))
      .withColumn("rem", expr(s"(n_s * $total) % n_tot"))
    val wRem = Window.orderBy(col("rem").desc, col("stratum"))
    val wTot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val alloc = cnt
      .withColumn("leftover", lit(total) - sum(col("base")).over(wTot))
      .withColumn("rk", row_number().over(wRem))
      .withColumn("alloc",
        least(col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L),
          col("n_s")))
      .select(col("stratum"), col("alloc"))
    val wPick = Window.partitionBy(col(stratCol))
      .orderBy(md5(concat(lit(s"$seed|"), col(idCol).cast("string"))), col(idCol))
    d.select(col(idCol), col(stratCol), row_number().over(wPick).as("rnk"))
      .join(broadcast(alloc), col(stratCol) === col("stratum"))
      .filter(col("rnk") <= col("alloc"))
      .select(col(idCol), col(stratCol), col("rnk").cast("long").as("rnk"))
  }

  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    stratifiedSampleOf(docs(s, dir), "doc_id", "lang", 100L, "strat1")
      .orderBy(col("doc_id"))

  val stratifiedSampleSql: String =
    """WITH cnt AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM cnt),
      |q AS (SELECT lang, n_s, (n_s * 100) // n_tot AS base, (n_s * 100) % n_tot AS rem
      |  FROM cnt CROSS JOIN tot),
      |a AS (SELECT lang, n_s, base, rem,
      |    100 - sum(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
      |  FROM q),
      |alloc AS (SELECT lang,
      |    least(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END, n_s) AS alloc
      |  FROM a),
      |r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
      |    ORDER BY md5('strat1|' || CAST(doc_id AS VARCHAR)), doc_id) AS rnk
      |  FROM documents)
      |SELECT r.doc_id, r.lang, CAST(r.rnk AS BIGINT) AS rnk
      |FROM r JOIN alloc ON alloc.lang = r.lang
      |WHERE r.rnk <= alloc.alloc ORDER BY r.doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q198 — embedding-space label similarity (exact-sum centroids)
  // ---------------------------------------------------------------

  /** Pairwise cosine between per-label embedding CENTROIDS — the
    * semantic companion to q125's lexical source-overlap: which label
    * populations occupy the same region of embedding space (merge
    * candidates for mixture planning; suspects for label noise).
    *
    * Determinism without float-order hazards: each component is
    * fixed-pointed per row (`round(x·1e6)` BIGINT — exact for float32
    * inputs), per-(label, dim) sums are exact integers, and the dot /
    * norm products are widened to DECIMAL(38)/HUGEINT so they cannot
    * wrap. Only THEN does the math touch doubles — int→double
    * conversion, sqrt and division are all IEEE correctly-rounded, so
    * both engines produce the identical final 1e-6 fixed point.
    * Scale shape: ONE (label, dim) shuffle of longs over the corpus
    * (map-side partial sums); everything after is |labels|·dims
    * rows. */
  def labelCentroidSimOf(emb: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val comp = emb.select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .withColumn("vfx", round(col("x").cast("double") * 1e6).cast("long"))
    val sums = graft.PlanCapture.checkpoint(
      comp.groupBy(col("label"), col("dim"))
        .agg(sum(col("vfx")).as("sfx"), count(lit(1)).as("nv")),
      "centroid-sums")
    val norms = sums.groupBy(col("label")).agg(
      sum(expr("CAST(sfx AS DECIMAL(38,0)) * sfx")).as("nrm2"),
      max(col("nv")).as("n_vecs"))
    val a = sums.select(col("label").as("label_a"), col("dim"), col("sfx").as("sa"))
    val b = sums.select(col("label").as("label_b"), col("dim"), col("sfx").as("sb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(expr("CAST(sa AS DECIMAL(38,0)) * sb")).as("dot"))
      .join(broadcast(norms.select(col("label").as("label_a"),
        col("nrm2").as("na2"), col("n_vecs").as("n_a"))), Seq("label_a"))
      .join(broadcast(norms.select(col("label").as("label_b"),
        col("nrm2").as("nb2"), col("n_vecs").as("n_b"))), Seq("label_b"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        round(col("dot").cast("double") /
          (sqrt(col("na2").cast("double")) * sqrt(col("nb2").cast("double")))
          * 1e6).cast("long").as("cos_fx"))
      .orderBy(col("label_a"), col("label_b"))
  }

  def labelCentroidSim(s: SparkSession, dir: String): DataFrame =
    labelCentroidSimOf(Tables.load(s, dir, "embeddings"), "label", "embedding")

  val labelCentroidSimSql: String =
    """WITH idx AS (SELECT label, embedding,
      |    unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      |comp AS (SELECT label, i - 1 AS dim,
      |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS vfx
      |  FROM idx),
      |sums AS (SELECT label, dim, CAST(sum(vfx) AS BIGINT) AS sfx,
      |    count(*) AS nv
      |  FROM comp GROUP BY 1, 2),
      |norms AS (SELECT label,
      |    sum(CAST(sfx AS HUGEINT) * sfx) AS nrm2,
      |    CAST(max(nv) AS BIGINT) AS n_vecs
      |  FROM sums GROUP BY 1),
      |dots AS (SELECT a.label AS label_a, b.label AS label_b,
      |    sum(CAST(a.sfx AS HUGEINT) * b.sfx) AS dot
      |  FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label
      |  GROUP BY 1, 2)
      |SELECT label_a, label_b, na.n_vecs AS n_a, nb.n_vecs AS n_b,
      |  CAST(round(CAST(dot AS DOUBLE)
      |    / (sqrt(CAST(na.nrm2 AS DOUBLE)) * sqrt(CAST(nb.nrm2 AS DOUBLE)))
      |    * 1e6) AS BIGINT) AS cos_fx
      |FROM dots JOIN norms na ON na.label = label_a
      |JOIN norms nb ON nb.label = label_b
      |ORDER BY label_a, label_b""".stripMargin

  // ---------------------------------------------------------------
  // q199 — adjacent-repetition runs (gaps-and-islands on tokens)
  // ---------------------------------------------------------------

  /** Per-source adjacent-token repetition runs — the stutter
    * detector Gopher's n-gram fractions (q65) miss: "the the the"
    * inflates a 1-gram fraction only when it dominates the DOC, but
    * a long run inside an otherwise-clean doc is generation stutter
    * worth catching on its own. Classic gaps-and-islands: a run is a
    * maximal block of equal consecutive tokens (pos − dense running
    * island id); reports per source the longest run, docs containing
    * a run ≥ 3, and total tokens inside ≥ 3 runs. Exact integers.
    * Scale shape: the islands window partitions BY DOC (corpus-
    * parallel, never global); per-source close is bounded. */
  def repetitionRunsOf(d: DataFrame): DataFrame = {
    val toks = d.select(col("doc_id"), col("source"),
        posexplode(split(trim(col("text")), WS)).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val runs = toks
      .withColumn("chg",
        when(lag(col("tok"), 1).over(wDoc) === col("tok"), 0).otherwise(1))
      .withColumn("island", sum(col("chg")).over(wDoc))
      .groupBy(col("doc_id"), col("source"), col("island"))
      .agg(count(lit(1)).as("run_len"))
    runs.groupBy(col("doc_id"), col("source"))
      .agg(max(col("run_len")).as("doc_max_run"),
        sum(when(col("run_len") >= 3, col("run_len")).otherwise(0L))
          .as("doc_run_tokens"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("doc_max_run")).as("max_run"),
        sum(when(col("doc_max_run") >= 3, 1L).otherwise(0L)).as("n_docs_run3"),
        sum(col("doc_run_tokens")).as("run_tokens"))
      .orderBy(col("source"))
  }

  def repetitionRuns(s: SparkSession, dir: String): DataFrame =
    repetitionRunsOf(docs(s, dir))

  val repetitionRunsSql: String =
    s"""WITH toks AS (SELECT doc_id, source,
       |    string_split_regex(trim(text), '$WS') AS ts FROM documents),
       |pos AS (SELECT doc_id, source, ts,
       |    unnest(generate_series(1, len(ts))) AS i FROM toks),
       |tk AS (SELECT doc_id, source, i AS pos, ts[i] AS tok
       |  FROM pos WHERE ts[i] <> ''),
       |ch AS (SELECT doc_id, source, pos, tok,
       |    CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) = tok
       |         THEN 0 ELSE 1 END AS chg
       |  FROM tk),
       |isl AS (SELECT doc_id, source,
       |    sum(chg) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM ch),
       |runs AS (SELECT doc_id, source, island, count(*) AS run_len
       |  FROM isl GROUP BY 1, 2, 3),
       |per AS (SELECT doc_id, source, max(run_len) AS doc_max_run,
       |    sum(CASE WHEN run_len >= 3 THEN run_len ELSE 0 END) AS doc_run_tokens
       |  FROM runs GROUP BY 1, 2)
       |SELECT source, count(*) AS n_docs,
       |  CAST(max(doc_max_run) AS BIGINT) AS max_run,
       |  CAST(sum(CASE WHEN doc_max_run >= 3 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_docs_run3,
       |  CAST(sum(doc_run_tokens) AS BIGINT) AS run_tokens
       |FROM per GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------
  // q200 — cohort retention over the events feed
  // ---------------------------------------------------------------

  /** Day-cohort retention over the events stream: cohort = a user's
    * first-event day; for each (cohort_day, day_k) the count of
    * cohort users active k days later — THE product-analytics read
    * on a feed (is the day-5 retention of January 10th's cohort
    * holding?). Exact integers and dates only. Scale shape: first-
    * event is one groupBy(user); the activity join is user-keyed
    * (same key — the shuffle partitioning is reused, no second
    * corpus exchange); the (cohort, k, user) distinct is bounded by
    * active user-days, and the close is cohort×horizon-bounded. */
  def cohortRetentionOf(events: DataFrame): DataFrame = {
    val d = events.select(col("user_id"),
      to_date(timestamp_micros(expr("ts div 1000"))).as("day"))
    val first = d.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    d.join(first, Seq("user_id"))
      .select(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_k"), col("user_id"))
      .distinct()
      .groupBy(col("cohort_day"), col("day_k"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_k"))
  }

  def cohortRetention(s: SparkSession, dir: String): DataFrame =
    cohortRetentionOf(Tables.load(s, dir, "events"))

  val cohortRetentionSql: String =
    """WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
      |r AS (SELECT DISTINCT cohort_day,
      |    CAST(day - cohort_day AS INT) AS day_k, d.user_id
      |  FROM d JOIN f USING (user_id))
      |SELECT cohort_day, day_k, count(*) AS n_users
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // q201 — dataset release gate (the CI checklist over the audits)
  // ---------------------------------------------------------------

  /** The release checklist a dataset build runs before shipping: six
    * named checks, each a tiny aggregate of an already-certified
    * audit kernel, emitted as (check, value_fx, threshold_fx, pass) —
    * the one table a release pipeline actually blocks on. Checks and
    * their scale-free thresholds (shares, not counts, so the gate
    * means the same thing at 500 docs and 100 TB):
    *   - quality_pass_share ≥ 0.50  (q187's four-rule screen)
    *   - exact_dup_share    ≤ 0.05  (md5 text fingerprints, q28 kernel)
    *   - near_dup_share     ≤ 0.10  (q31's MinHash+LSH kernel: docs a
    *     canonical collapse would mask — round-13, VERDICT r12 item 5)
    *   - stutter_doc_share  ≤ 0.05  (q199's run ≥ 3 exposure)
    *   - empty_doc_share    ≤ 0.01  (zero-word docs)
    *   - val_oov_share      ≤ 0.20  (q194's LM: val tokens unseen in train)
    * All shares are exact truncating 1e-6 fixed point; `pass` is an
    * exact integer comparison, so the verdict can never float-drift.
    *
    * Scale shape (round-12, VERDICT r11 item 4 — was 7 corpus scans,
    * one per check): THREE corpus scans total. Scan 1 is one map-only
    * per-doc projection — text fingerprint, the q187 four-rule pass
    * flag, token count, and the q199 max-repetition-run computed as a
    * map-side ARRAY FOLD over the token list (no per-token window;
    * identical run semantics, certified by the unchanged oracle) —
    * reduced by ONE aggregate (quality/dup/stutter/empty all
    * conditional sums + one count_distinct). Scan 2 is the val-OOV
    * check: one (tok) shuffle aggregating train/val counts per token
    * TYPE side by side — the q194 kernel folded into a single pass.
    * Scan 3 (round-13) is the near-dup check's shingle pipeline —
    * near-dup truth has no per-doc sufficient statistic, so this scan
    * is irreducible; the streaming twin amortizes it by landing band
    * keys + shingle arrays per batch and never re-reading text. */
  /** The gate's named checks with their scale-free thresholds and
    * direction (gte = pass when value ≥ threshold). */
  private val releaseChecks = Seq(
    ("quality_pass_share", 500000L, true),
    ("exact_dup_share", 50000L, false),
    ("near_dup_share", 100000L, false),
    ("stutter_doc_share", 50000L, false),
    ("empty_doc_share", 10000L, false),
    ("val_oov_share", 200000L, false))

  /** Threshold join + pass verdict over (chk, v) rows — shared by the
    * batch gate and the streaming rollup so both emit the identical
    * 5-row table. */
  private[graft] def releaseVerdict(values: DataFrame): DataFrame = {
    val thresholds = values.sparkSession.createDataFrame(releaseChecks)
      .toDF("chk", "threshold_fx", "gte")
    values
      .join(broadcast(thresholds), Seq("chk"))
      .select(col("chk"), col("v").as("value_fx"), col("threshold_fx"),
        when(col("gte"), col("v") >= col("threshold_fx"))
          .otherwise(col("v") <= col("threshold_fx")).as("pass"))
      .orderBy(col("chk"))
  }

  /** Scan-1 kernel: the per-doc projection every doc-level check reads
    * — text fingerprint, token count, array-fold max repetition run,
    * q187 quality pass. Map-only; shared by the batch gate and the
    * streaming rollup. */
  private[graft] def releasePerDoc(d: DataFrame): DataFrame = {
    val t = trim(col("text"))
    val ts = split(t, WS)
    // q199's gaps-and-islands per-doc max run, as a map-side fold over
    // the token array: (prev, cur, mx) ← extend the run on equality,
    // reset to 1 otherwise. Empty docs fold to mx = 0 (no tokens), so
    // they stay OUT of the stutter denominator exactly as in the
    // window form, whose oracle still certifies these values.
    val maxRun = aggregate(
      filter(ts, x => x =!= ""),
      struct(lit("").as("prev"), lit(0L).as("cur"), lit(0L).as("mx")),
      (acc, x) => {
        val cur2 = when(x === acc("prev"), acc("cur") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), cur2.as("cur"), greatest(acc("mx"), cur2).as("mx"))
      },
      acc => acc("mx"))
    d.select(
        md5(col("text")).as("fp"),
        when(length(t) === 0, 0L).otherwise(size(ts).cast("long")).as("nw"),
        length(regexp_replace(t, WS, "")).cast("long").as("nch"),
        size(filter(ts, w => w.isin("the", "a", "of", "and", "to", "in")))
          .cast("long").as("nstop"),
        size(array_distinct(ts)).cast("long").as("ndis"),
        maxRun.as("max_run"))
      .select(col("fp"), col("nw"), col("max_run"),
        // the q187 conjunction, verbatim from qualityRuleFlags
        (col("nw").between(30L, 100000L) &&
          col("nw") > 0L &&
          expr("(nch * 1000000) div nw").between(3000000L, 10000000L) &&
          col("nstop") >= 2L &&
          expr("(ndis * 1000000) div nw") >= 500000L).as("q_pass"))
  }

  /** Scan-2 kernel: train/val counts per token TYPE (the q194 LM's
    * OOV inputs, one pass) — additive across batches, so the
    * streaming rollup can accumulate it per micro-batch. */
  private[graft] def releaseTokenCounts(d: DataFrame): DataFrame =
    d.select(isTrain(col("doc_id")).as("tr"),
        explode(split(trim(col("text")), WS)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("ctr"),
        sum(when(!col("tr"), 1L).otherwise(0L)).as("cv"))

  def releaseGateOf(d: DataFrame): DataFrame = {
    // every share is an exact truncating integer division (`div`, the
    // DuckDB `//` twin) — Column./ would be double division
    val docChecks = releasePerDoc(d)
      .agg(count(lit(1)).as("n"),
        sum(when(col("q_pass"), 1L).otherwise(0L)).as("p"),
        countDistinct(col("fp")).as("uniq"),
        sum(when(col("nw") > 0L, 1L).otherwise(0L)).as("ntokdocs"),
        sum(when(col("max_run") >= 3L, 1L).otherwise(0L)).as("r3"),
        sum(when(col("nw") === 0L, 1L).otherwise(0L)).as("e"))
      .select(expr(
        """stack(4,
          |  'quality_pass_share', (p * 1000000) div n,
          |  'exact_dup_share', ((n - uniq) * 1000000) div n,
          |  'stutter_doc_share', (r3 * 1000000) div ntokdocs,
          |  'empty_doc_share', (e * 1000000) div n) AS (chk, v)""".stripMargin))
    val oov = releaseTokenCounts(d)
      .agg(sum(when(col("ctr") === 0L, col("cv")).otherwise(0L)).as("o"),
        sum(col("cv")).as("n"))
      .select(lit("val_oov_share").as("chk"),
        expr("(o * 1000000) div n").as("v"))
    // Check 6 (round-13, VERDICT r12 item 5): near-dup ESCAPE share —
    // docs the q31-certified MinHash+LSH kernel would mask (any
    // verified pair with a smaller id makes a doc the later
    // duplicate), over all docs. This is the one check that needs its
    // own corpus scan (shingles), taking the fused gate from 2 scans
    // to 3 — near-dup truth has no per-doc sufficient statistic.
    val nearDup = Dedup.minhashDedup(d, "doc_id", "text")
      .agg(countDistinct(col("id_b")).as("nd"))
      .crossJoin(d.agg(count(lit(1)).as("n")))
      .select(lit("near_dup_share").as("chk"),
        expr("(nd * 1000000) div n").as("v"))
    releaseVerdict(docChecks.unionByName(oov).unionByName(nearDup))
  }

  def releaseGate(s: SparkSession, dir: String): DataFrame =
    releaseGateOf(docs(s, dir))

  // ---------------------------------------------------------------
  // q205 — val-OOV trend across appends (crawl-order cohorts)
  // ---------------------------------------------------------------

  /** Shared trend kernel: cumulative val-OOV share per batch PREFIX
    * from per-batch token-type counts (batch, tok, ctr, cv) — the
    * additive sufficient statistic the streaming release gate already
    * lands. The ≤-join against the distinct batch ids replays each
    * prefix exactly (|tok rows| × |batches|, vocabulary-bounded ×
    * append-count-bounded — never corpus-bounded); a zero-val prefix
    * emits the all-OOV sentinel instead of dividing by zero (the q196
    * rule). */
  private[graft] def oovTrendFrom(tok: DataFrame): DataFrame = {
    val batches = tok.select(col("batch")).distinct()
      .withColumnRenamed("batch", "upto")
    tok.join(broadcast(batches), col("batch") <= col("upto"))
      .groupBy(col("upto"), col("tok"))
      .agg(sum(col("ctr")).as("ctr"), sum(col("cv")).as("cv"))
      .groupBy(col("upto"))
      .agg(sum(when(col("ctr") === 0L, col("cv")).otherwise(0L)).as("o"),
        sum(col("cv")).as("n"))
      .select(col("upto").cast("long").as("batch"),
        when(col("n") === 0L, lit(1000000L))
          .otherwise(expr("(o * 1000000) div n")).as("val_oov_fx"))
      .orderBy(col("batch"))
  }

  /** Per-append val-OOV trajectory: split the corpus into crawl-order
    * cohorts (ntile over doc_id — the q195 crawl-order notion; at
    * 100 TB the cohorts would be the actual append batch ids, as in
    * the streaming twin, so no global sort exists there) and report
    * the release gate's val_oov_share as each cohort lands. A trend
    * bending UP means new crawl slices carry vocabulary the train
    * split hasn't seen — retrain the tokenizer/LM before trusting
    * q194's numbers; trending DOWN means the val slice is saturating.
    * The final row equals q201's val_oov_share by construction
    * (spec-pinned). */
  def valOovTrendOf(d: DataFrame, nCohorts: Int = 4): DataFrame = {
    val byCohort = d.select(col("doc_id"), col("text"))
      .withColumn("batch",
        ntile(nCohorts).over(Window.orderBy(col("doc_id"))) - 1)
    val tok = byCohort.select(col("batch"), isTrain(col("doc_id")).as("tr"),
        explode(split(trim(col("text")), WS)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("batch"), col("tok"))
      .agg(sum(when(col("tr"), 1L).otherwise(0L)).as("ctr"),
        sum(when(!col("tr"), 1L).otherwise(0L)).as("cv"))
    oovTrendFrom(tok)
  }

  def valOovTrend(s: SparkSession, dir: String): DataFrame =
    valOovTrendOf(docs(s, dir))

  val valOovTrendSql: String =
    s"""WITH coh AS (SELECT doc_id, text,
       |    ntile(4) OVER (ORDER BY doc_id) - 1 AS batch FROM documents),
       |tk AS (SELECT batch,
       |    substr(md5('v1|' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' AS tr,
       |    unnest(string_split_regex(trim(text), '$WS')) AS tok
       |  FROM coh),
       |tc AS (SELECT batch, tok,
       |    sum(CASE WHEN tr THEN 1 ELSE 0 END) AS ctr,
       |    sum(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS cv
       |  FROM tk WHERE tok <> '' GROUP BY 1, 2),
       |b AS (SELECT DISTINCT batch AS upto FROM tc),
       |cum AS (SELECT b.upto, t.tok, sum(t.ctr) AS ctr, sum(t.cv) AS cv
       |  FROM tc t JOIN b ON t.batch <= b.upto GROUP BY 1, 2)
       |SELECT CAST(upto AS BIGINT) AS batch,
       |  CAST(CASE WHEN sum(cv) = 0 THEN 1000000
       |    ELSE (sum(CASE WHEN ctr = 0 THEN cv ELSE 0 END) * 1000000)
       |      // sum(cv) END AS BIGINT) AS val_oov_fx
       |FROM cum GROUP BY 1 ORDER BY batch""".stripMargin

  val releaseGateSql: String = {
    val nTok =
      s"""CASE WHEN length(trim(text)) = 0 THEN 0
         | ELSE len(string_split_regex(trim(text), '$WS')) END""".stripMargin
    s"""WITH ${CurationOps.qualityPassCteSql},
       |qv AS (SELECT 'quality_pass_share' AS chk,
       |    CAST((sum(pass) * 1000000) // count(*) AS BIGINT) AS value_fx
       |  FROM qpass),
       |fp AS (SELECT md5(text) AS f, count(*) AS n FROM documents GROUP BY 1),
       |dv AS (SELECT 'exact_dup_share' AS chk,
       |    CAST(((sum(n) - count(*)) * 1000000) // sum(n) AS BIGINT) AS value_fx
       |  FROM fp),
       |stoks AS (SELECT doc_id, string_split_regex(trim(text), '$WS') AS ts
       |  FROM documents),
       |spos AS (SELECT doc_id, ts, unnest(generate_series(1, len(ts))) AS i
       |  FROM stoks),
       |stk AS (SELECT doc_id, i AS pos, ts[i] AS tok FROM spos
       |  WHERE ts[i] <> ''),
       |sch AS (SELECT doc_id, pos,
       |    CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos) = tok
       |         THEN 0 ELSE 1 END AS chg
       |  FROM stk),
       |sisl AS (SELECT doc_id,
       |    sum(chg) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM sch),
       |sruns AS (SELECT doc_id, island, count(*) AS run_len
       |  FROM sisl GROUP BY 1, 2),
       |sper AS (SELECT doc_id, max(run_len) AS doc_max_run
       |  FROM sruns GROUP BY 1),
       |sv AS (SELECT 'stutter_doc_share' AS chk,
       |    CAST((sum(CASE WHEN doc_max_run >= 3 THEN 1 ELSE 0 END) * 1000000)
       |      // count(*) AS BIGINT) AS value_fx
       |  FROM sper),
       |ev AS (SELECT 'empty_doc_share' AS chk,
       |    CAST((sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
       |      * 1000000) // count(*) AS BIGINT) AS value_fx
       |  FROM documents),
       |osp AS (SELECT text,
       |    substr(md5('v1|' || CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' AS tr
       |  FROM documents),
       |otk AS (SELECT tr, unnest(string_split_regex(trim(text), '$WS')) AS tok
       |  FROM osp),
       |olm AS (SELECT DISTINCT tok FROM otk WHERE tr AND tok <> ''),
       |ovc AS (SELECT o.tok, count(*) AS cv, max(CASE WHEN l.tok IS NULL
       |      THEN 1 ELSE 0 END) AS oov
       |  FROM otk o LEFT JOIN olm l ON l.tok = o.tok
       |  WHERE NOT o.tr AND o.tok <> '' GROUP BY o.tok),
       |ov AS (SELECT 'val_oov_share' AS chk,
       |    CAST((sum(cv * oov) * 1000000) // sum(cv) AS BIGINT) AS value_fx
       |  FROM ovc),
       |${DedupShapes.lshPairsCteFrom("documents")},
       |ndv AS (SELECT 'near_dup_share' AS chk,
       |    CAST((count(DISTINCT p.id_b) * 1000000)
       |      // (SELECT count(*) FROM documents) AS BIGINT) AS value_fx
       |  FROM pairs p),
       |vals AS (SELECT * FROM qv UNION ALL SELECT * FROM dv
       |  UNION ALL SELECT * FROM sv UNION ALL SELECT * FROM ev
       |  UNION ALL SELECT * FROM ov UNION ALL SELECT * FROM ndv),
       |th(chk, threshold_fx, gte) AS (VALUES
       |  ('quality_pass_share', CAST(500000 AS BIGINT), true),
       |  ('exact_dup_share', CAST(50000 AS BIGINT), false),
       |  ('near_dup_share', CAST(100000 AS BIGINT), false),
       |  ('stutter_doc_share', CAST(50000 AS BIGINT), false),
       |  ('empty_doc_share', CAST(10000 AS BIGINT), false),
       |  ('val_oov_share', CAST(200000 AS BIGINT), false))
       |SELECT v.chk, v.value_fx, t.threshold_fx,
       |  CASE WHEN t.gte THEN v.value_fx >= t.threshold_fx
       |       ELSE v.value_fx <= t.threshold_fx END AS pass
       |FROM vals v JOIN th t ON t.chk = v.chk
       |ORDER BY v.chk""".stripMargin
  }

  // ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q201_release_gate" -> releaseGate,
    "q194_val_cross_entropy" -> valCrossEntropy,
    "q195_bigram_novelty" -> bigramNovelty,
    "q196_length_ks" -> lengthKs,
    "q197_stratified_sample" -> stratifiedSample,
    "q198_label_centroid_sim" -> labelCentroidSim,
    "q199_repetition_runs" -> repetitionRuns,
    "q200_cohort_retention" -> cohortRetention,
    "q205_val_oov_trend" -> valOovTrend)

  def oracles: Map[String, String] = Map(
    "q201_release_gate" -> releaseGateSql,
    "q194_val_cross_entropy" -> valCrossEntropySql,
    "q195_bigram_novelty" -> bigramNoveltySql,
    "q196_length_ks" -> lengthKsSql,
    "q197_stratified_sample" -> stratifiedSampleSql,
    "q198_label_centroid_sim" -> labelCentroidSimSql,
    "q199_repetition_runs" -> repetitionRunsSql,
    "q200_cohort_retention" -> cohortRetentionSql,
    "q205_val_oov_trend" -> valOovTrendSql)
}
