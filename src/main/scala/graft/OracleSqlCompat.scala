package graft

/** DuckDB-compat rewrite applied to every oracle SQL string as it is
  * emitted (`SparkEntry.oracleSql`), so the driver's DuckDB run and
  * the local `tools/check_oracle.py` mirror both see it.
  *
  * Why: DuckDB 1.0 INLINES a named CTE at every reference site when
  * the statement contains `WITH RECURSIVE` (no auto-materialization
  * in that mode), so a chain of CTEs that each reference earlier ones
  * more than once is re-evaluated combinatorially. The 25-stage
  * q99_curation_recipe oracle measured **~7 minutes at sf0.01 (500
  * docs!)** under that inlining and **0.6 s** with `MATERIALIZED`
  * hints; the full 193-oracle pass drops from >10 min to ~42 s.
  * That inlining blowup is what most plausibly starved the round-10
  * driver gate into an empty `CORRECTNESS_r10.json` (VERDICT r10 §1).
  *
  * The hint is semantics-preserving (same rows, just forced
  * evaluation order — verified by a full 193-query gate run), and
  * recursive CTEs are structurally skipped: every recursive CTE in
  * this codebase is declared WITH a column list (`reach(id, r) AS (`)
  * and the rewrite only matches the bare `name AS (` form, at line
  * start or immediately after `WITH` / `WITH RECURSIVE`. Already-
  * hinted CTEs (`t AS MATERIALIZED (` in the q113/q120 oracles) are
  * left untouched because the pattern requires `AS (`.
  */
object OracleSqlCompat {
  private val CteDef =
    "(?m)(^[ \\t]*|\\bWITH RECURSIVE[ \\t]+|\\bWITH[ \\t]+)([A-Za-z_][A-Za-z0-9_]*)[ \\t]+AS[ \\t]+\\(".r

  /** Scoped to statements that actually contain `WITH RECURSIVE`
    * (round-12 ADVICE): that is the only mode where DuckDB re-inlines
    * multi-referenced CTEs (plain WITH chains are auto-materialized
    * when referenced more than once), and it shrinks the textual
    * regex's blast radius — a future non-recursive oracle with a
    * line-leading `name AS (` that is NOT a CTE (a multi-line WINDOW
    * clause, a derived-table alias) can no longer be rewritten into
    * invalid SQL. OracleSqlCompatSpec pins the non-matching forms. */
  def materializeCtes(sql: String): String =
    if (!sql.contains("WITH RECURSIVE")) sql
    else CteDef.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        m.group(1) + m.group(2) + " AS MATERIALIZED ("))
}
