package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the training-data pipeline
  * (quality scoring, language ID, token counting, fingerprinting,
  * redaction — SC7/SC8 generalized per the north star).
  *
  * All are composed from codegen'd built-ins (no UDFs) so they stay
  * inside WholeStageCodegen and push through Catalyst untouched.
  * Every function has an exact SQL mirror used by the DuckDB oracle
  * (ops.TextAnalysis) — patterns are RE2-compatible (no lookahead,
  * no backrefs) so Java regex and DuckDB agree.
  */
object TextFunctions {

  /** Whitespace token count; empty/blank → 0. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish token count: letter runs, digit runs, single other
    * non-space (the pre-tokenizer shape used by byte-pair encoders). */
  val bpePattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeTokenCount(c: Column): Column = regexp_count(c, lit(bpePattern))

  /** Language-ID marker patterns (stopword n-gram heuristic). Order is
    * the deterministic argmax tie-break order. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is)\\b",
    "es" -> "\\b(el|la|de|que|los|una)\\b",
    "de" -> "\\b(der|die|und|das|ein|nicht)\\b",
    "fr" -> "\\b(le|les|et|des|une|est)\\b",
    "zh" -> "[\\x{4e00}-\\x{9fff}]")

  def langScore(c: Column, lang: String): Column =
    regexp_count(c, lit(langMarkers.toMap.apply(lang)))

  /** Predicted language: argmax of marker scores, 'und' when all 0,
    * ties broken in langMarkers order. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(c, l) }
    val g = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(g > 0 && s === g, lit(l)).otherwise(acc)
    }
    // foldRight keeps first-match-wins order: en checked first.
  }

  val stopwordPattern = "\\b(the|a|of|and|in|to|is)\\b"
  def stopwordCount(c: Column): Column = regexp_count(c, lit(stopwordPattern))
  def punctCount(c: Column): Column = regexp_count(c, lit("[^a-zA-Z0-9\\s]"))

  /** Composite quality score in [0,1] — length, punctuation and
    * stopword-density components (the heuristic-quality-filter shape
    * used by web-scale corpus pipelines). */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val stopRatio = stopwordCount(c) / nullif(nTok, lit(0.0))
    val punctRatio = punctCount(c) / nullif(length(c).cast("double"), lit(0.0))
    coalesce(
      round(
        lit(0.5) * least(lit(1.0), nTok / lit(50.0)) +
          lit(0.3) * (lit(1.0) - least(lit(1.0), punctRatio * lit(10.0))) +
          lit(0.2) * least(lit(1.0), stopRatio * lit(5.0)),
        6),
      lit(0.0))
  }

  /** Document fingerprint: md5 of the exact text (the exact-dedup
    * key). */
  def fingerprint(c: Column): Column = md5(c)

  /** Word n-grams of a token-array column, space-joined — built from
    * n ALIGNED SLICES zipped together so every lambda body touches
    * only its lambda variables.
    *
    * PERF CONTRACT (load-bearing): higher-order functions evaluate
    * interpreted (CodegenFallback), and a lambda body that captures an
    * outer subexpression re-computes it PER ELEMENT once the optimizer
    * inlines projections — the `transform(sequence(…), i →
    * slice(ts, i, n))` shape re-ran its upstream (regex split, md5
    * chains) hundreds of times per row in filter contexts. With this
    * form, upstream expressions appear only as zip_with ARGUMENTS,
    * evaluated once per call — at most n times per row, regardless of
    * what the optimizer inlines. Callers must guarantee
    * size(tokens) ≥ n (slice length must be positive). */
  def ngramArray(tokens: Column, n: Int): Column = {
    require(n >= 1, "n must be >= 1")
    val cnt = size(tokens) - (n - 1)
    (2 to n).foldLeft(slice(tokens, lit(1), cnt)) { (acc, j) =>
      zip_with(acc, slice(tokens, lit(j), cnt), (a, b) => concat(a, lit(" "), b))
    }
  }

  /** 16-bit SimHash over whitespace tokens, emitted as a bit string.
    * Portable construction: token hash = md5; hex digit j ≥ '8' votes
    * +1 for bit j, else −1; bit set iff vote sum > 0. Near-dup docs
    * differ in few bits (Charikar similarity estimation). Column form
    * here is the per-token vote; the full doc-level simhash lives in
    * ops.Dedup.simhash (needs an explode + re-agg). */
  def tokenBitVote(tokenHash: Column, j: Int): Column =
    // digit ≥ '8' as a single char-code compare: md5 hex is lowercase
    // [0-9a-f], and {'8','9','a'..'f'} is exactly ascii ≥ 56 there —
    // one comparison instead of an 8-way string isin, evaluated
    // 32 times per token in the SimHash aggregation.
    when(ascii(substring(tokenHash, j + 1, 1)) >= 56, 1).otherwise(-1)

  /** SC7 — log-redaction chain from the reference logger
    * (internal/logger/logger.go:41-55): emails, bearer/JWT-ish
    * tokens, user_id=N. RE2-safe patterns. */
  def redact(c: Column): Column = {
    val email = regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[email]")
    val jwt = regexp_replace(email, "eyJ[A-Za-z0-9_.-]+", "[token]")
    regexp_replace(jwt, "user_id=[0-9]+", "user_id=[id]")
  }

  /** The same chain as DuckDB SQL (for oracle construction). */
  def redactSql(inner: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($inner, " +
      "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[email]', 'g'), " +
      "'eyJ[A-Za-z0-9_.-]+', '[token]', 'g'), " +
      "'user_id=[0-9]+', 'user_id=[id]', 'g')"
}
