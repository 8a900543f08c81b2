package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the MATERIALIZED-CTE rewrite's scope (round-12 ADVICE): the
  * textual regex must only fire inside statements containing
  * `WITH RECURSIVE` (the one DuckDB mode that re-inlines CTE chains),
  * and within those it must leave every non-CTE `name AS (` form
  * untouched — the shapes current oracles avoid only by convention. */
class OracleSqlCompatSpec extends AnyFunSuite {

  test("non-recursive statements pass through verbatim") {
    val sql =
      """WITH a AS (SELECT 1 AS x),
        |b AS (SELECT x FROM a)
        |SELECT * FROM b""".stripMargin
    assert(OracleSqlCompat.materializeCtes(sql) == sql)
  }

  test("plain CTEs in a recursive statement get MATERIALIZED") {
    val sql =
      """WITH RECURSIVE reach(id, r) AS (
        |  SELECT id, 0 FROM seeds
        |  UNION ALL SELECT e.dst, r + 1 FROM reach JOIN e ON e.src = reach.id),
        |base AS (SELECT * FROM t),
        |agg AS (SELECT count(*) FROM base)
        |SELECT * FROM reach CROSS JOIN agg""".stripMargin
    val out = OracleSqlCompat.materializeCtes(sql)
    assert(out.contains("base AS MATERIALIZED (SELECT * FROM t)"))
    assert(out.contains("agg AS MATERIALIZED (SELECT count(*) FROM base)"))
    // the recursive CTE itself declares a column list, so it never
    // matches the bare `name AS (` form
    assert(out.contains("reach(id, r) AS ("))
  }

  test("WINDOW clause, column-list CTE, and existing hints are untouched") {
    val sql =
      """WITH RECURSIVE t(i) AS (SELECT 1),
        |pre AS MATERIALIZED (SELECT * FROM src),
        |named(cols) AS (SELECT 2)
        |SELECT sum(i) OVER w FROM t WINDOW w AS (ORDER BY i)""".stripMargin
    val out = OracleSqlCompat.materializeCtes(sql)
    assert(out.contains("t(i) AS (SELECT 1)"))
    assert(out.contains("pre AS MATERIALIZED (SELECT * FROM src)"))
    assert(!out.contains("MATERIALIZED MATERIALIZED"))
    assert(out.contains("named(cols) AS (SELECT 2)"))
    // mid-line `WINDOW w AS (` never matches (the name must sit at
    // line start or directly after WITH / WITH RECURSIVE); keeping
    // WINDOW clauses on one line stays a REQUIRED convention inside
    // recursive oracles and is now irrelevant everywhere else
    assert(out.contains("WINDOW w AS (ORDER BY i)"))
  }

  test("derived-table alias `x AS (` mid-line never matches") {
    val sql =
      """WITH RECURSIVE t(i) AS (SELECT 1)
        |SELECT * FROM t JOIN (SELECT 2 AS y) d ON d.y = t.i""".stripMargin
    assert(OracleSqlCompat.materializeCtes(sql) == sql)
  }
}
