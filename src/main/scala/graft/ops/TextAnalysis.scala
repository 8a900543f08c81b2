package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.row_number

/** Text-analysis operators over the `documents` table (north-star
  * extension: language-ID, quality scoring, token counting,
  * fingerprinting, redaction). Pure codegen'd built-ins; oracle SQL
  * mirrors each expression exactly (RE2-safe patterns).
  */
object TextAnalysis {
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  // DuckDB mirror of regexp_count.
  private def rc(colSql: String, pat: String) =
    s"len(regexp_extract_all($colSql, '$pat'))"

  // Single-backslash \s+ for SQL literals (triple-quoted Scala strings
  // keep \\ as two characters, which RE2 would read as an escaped
  // backslash).
  private val WS = "\\s+"

  /** Token statistics per document (whitespace + BPE-ish counts). */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"),
      length(col("text")).as("n_chars"))
      .orderBy(col("doc_id"))

  val tokenStatsSql: String =
    s"""SELECT doc_id,
       |  CASE WHEN length(trim(text)) = 0 THEN 0
       |       ELSE len(string_split_regex(trim(text), '$WS')) END AS n_tokens,
       |  ${rc("text", "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]")} AS n_bpe_tokens,
       |  length(text) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Language-ID confusion matrix: labeled lang × predicted lang. */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("lang_pred", langId(col("text")))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))

  val langIdConfusionSql: String = {
    val scores = langMarkers.map { case (l, p) => s"${rc("text", p)} AS s_$l" }.mkString(", ")
    val g = "greatest(" + langMarkers.map { case (l, _) => s"s_$l" }.mkString(", ") + ")"
    val cases = langMarkers.map { case (l, _) => s"WHEN s_$l = g THEN '$l'" }.mkString(" ")
    s"""WITH sc AS (SELECT lang, $scores FROM documents),
       |p AS (SELECT lang, CASE WHEN g = 0 THEN 'und' $cases END AS lang_pred
       |  FROM (SELECT $g AS g, * FROM sc))
       |SELECT lang, lang_pred, count(*) AS n FROM p
       |GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin
  }

  /** Per-document quality score + components. */
  def qualityScores(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      stopwordCount(col("text")).as("n_stop"),
      punctCount(col("text")).as("n_punct"),
      qualityScore(col("text")).as("score"))
      .orderBy(col("doc_id"))

  val qualityScoresSql: String = {
    val nTok = s"""CASE WHEN length(trim(text)) = 0 THEN 0
       ELSE len(string_split_regex(trim(text), '$WS')) END"""
    val nStop = rc("text", "\\b(the|a|of|and|in|to|is)\\b")
    val nPunct = rc("text", "[^a-zA-Z0-9\\s]")
    s"""SELECT doc_id, n_tokens, n_stop, n_punct,
       |  coalesce(round(
       |    0.5 * least(1.0, CAST(n_tokens AS DOUBLE) / 50.0) +
       |    0.3 * (1.0 - least(1.0, (n_punct / nullif(CAST(length(text) AS DOUBLE), 0.0)) * 10.0)) +
       |    0.2 * least(1.0, (n_stop / nullif(CAST(n_tokens AS DOUBLE), 0.0)) * 5.0), 6), 0.0) AS score
       |FROM (SELECT doc_id, text, $nTok AS n_tokens, $nStop AS n_stop, $nPunct AS n_punct
       |      FROM documents) ORDER BY doc_id""".stripMargin
  }

  /** Exact dedup by content fingerprint (hash-groupBy; north-star
    * dedup #1). Map-side partial agg → tiny shuffle keyed on md5. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(fingerprint(col("text")).as("fingerprint"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("canonical_id"))

  val exactDedupSql: String =
    """SELECT md5(text) AS fingerprint, min(doc_id) AS canonical_id,
      |  count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY canonical_id""".stripMargin

  /** SC7 — redaction over synthetic loglines built from the corpus
    * (emails / JWT-ish tokens / user_id=N, mirroring
    * internal/logger/logger.go:41-55). */
  def redaction(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("doc_id") < 50)
      .select(
        col("doc_id"),
        redact(concat(
          lit("user "), col("source"),
          lit(" mail:"), col("source"), lit("@mail.example.com"),
          lit(" user_id="), col("doc_id"),
          lit(" tok:eyJhbGci."), col("lang"))).as("redacted"))
      .orderBy(col("doc_id"))

  val redactionSql: String = {
    val line = "'user ' || source || ' mail:' || source || '@mail.example.com'" +
      " || ' user_id=' || CAST(doc_id AS VARCHAR) || ' tok:eyJhbGci.' || lang"
    s"""SELECT doc_id, ${redactSql(line)} AS redacted
       |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin
  }

  /** Top-5 word bigrams per language (n-gram frequency profile —
    * reuses the dedup shingler; rank window with deterministic
    * tie-break). */
  def topBigrams(s: SparkSession, dir: String): DataFrame = {
    // lang rides along the explode (joining it back after shingling
    // costs a shuffle of every bigram string)
    val grams = docs(s, dir)
      .select(col("lang"), split(trim(col("text")), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("lang"), explode(array_distinct(expr(
        "transform(sequence(1, size(ts) - 1), i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))")))
        .as("bigram"))
    val counted = grams.groupBy(col("lang"), col("bigram"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram"))
    counted.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select(col("lang"), col("rnk"), col("bigram"), col("n"))
      .orderBy(col("lang"), col("rnk"))
  }

  val topBigramsSql: String =
    s"""WITH toks AS (SELECT doc_id AS id, lang,
       |    string_split_regex(trim(text), '$WS') AS ts FROM documents),
       |pos AS (SELECT id, lang, ts, unnest(generate_series(1, len(ts) - 1)) AS i
       |  FROM toks WHERE len(ts) >= 2),
       |sh AS (SELECT DISTINCT id, lang, ts[i] || ' ' || ts[i+1] AS bigram FROM pos),
       |counted AS (SELECT lang, bigram, count(*) AS n FROM sh GROUP BY lang, bigram),
       |r AS (SELECT lang, bigram, n,
       |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rnk
       |  FROM counted)
       |SELECT lang, rnk, bigram, n FROM r WHERE rnk <= 5
       |ORDER BY lang, rnk""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_top_bigrams" -> topBigrams,
    "q25_token_stats" -> tokenStats,
    "q26_langid_confusion" -> langIdConfusion,
    "q27_quality_scores" -> qualityScores,
    "q28_exact_dedup" -> exactDedup,
    "q29_redaction" -> redaction)

  def oracles: Map[String, String] = Map(
    "q45_top_bigrams" -> topBigramsSql,
    "q25_token_stats" -> tokenStatsSql,
    "q26_langid_confusion" -> langIdConfusionSql,
    "q27_quality_scores" -> qualityScoresSql,
    "q28_exact_dedup" -> exactDedupSql,
    "q29_redaction" -> redactionSql)
}
