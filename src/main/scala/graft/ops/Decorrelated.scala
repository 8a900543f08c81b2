package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** The two correlated-subquery TPC-H shapes still missing from the
  * relational sweep (Q13/Q17/Q18/Q22 analogs landed in round 8 as
  * q156/q164/q163/q157): the Q21 double-correlated EXISTS/NOT-EXISTS
  * and the Q2 per-group-argmin + dimension chain. Both are
  * DECORRELATED by hand into the join/aggregate form a scale-out
  * engine wants — the point of this module is the rewrite: every
  * correlated predicate becomes an explicit semi/anti/aggregate-join
  * whose shuffle keys are stated, so the plan the optimizer must
  * reach is pinned by construction.
  *
  * Money math follows the repo's fixed-point discipline (integer
  * cents, exact-integer comparisons), keeping every gate hash
  * partition-order free. */
object Decorrelated {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** q177 — TPC-H Q21-shaped waiting suppliers: suppliers who were
    * the ONLY one with a returned line in a finished multi-supplier
    * order (returnflag standing in for the receipt-after-commit
    * predicate this schema lacks). The double correlation —
    * EXISTS(another supplier in the order) ∧ NOT EXISTS(another
    * supplier with a returned line) — decorrelates to one LEFT SEMI
    * and one LEFT ANTI join, both equi-keyed on l_orderkey with the
    * supplier inequality as a residual condition, so all three fact
    * frames co-partition on the order key: one shuffle family, then
    * a supplier-keyed count and a broadcast name join. At 100 TB
    * nothing here is row-multiplying: semi/anti joins emit at most
    * one row per probe row. */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val al = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val rl = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val f = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))
    val cand = rl
      .join(f, rl("l_orderkey") === f("o_orderkey"), "left_semi")
      .join(al.select(col("l_orderkey").as("ao"), col("l_suppkey").as("as_")),
        rl("l_orderkey") === col("ao") && rl("l_suppkey") =!= col("as_"),
        "left_semi")
      .join(rl.select(col("l_orderkey").as("ro"), col("l_suppkey").as("rs")),
        rl("l_orderkey") === col("ro") && rl("l_suppkey") =!= col("rs"),
        "left_anti")
    cand.groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(30)
  }

  val waitingSuppliersSql: String =
    """WITH al AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      |rl AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      |  WHERE l_returnflag = 'R'),
      |cand AS (SELECT rl.l_orderkey, rl.l_suppkey FROM rl
      |  JOIN orders ON o_orderkey = rl.l_orderkey AND o_orderstatus = 'F'
      |  WHERE EXISTS (SELECT 1 FROM al
      |      WHERE al.l_orderkey = rl.l_orderkey
      |        AND al.l_suppkey <> rl.l_suppkey)
      |    AND NOT EXISTS (SELECT 1 FROM rl r2
      |      WHERE r2.l_orderkey = rl.l_orderkey
      |        AND r2.l_suppkey <> rl.l_suppkey))
      |SELECT s_name, count(*) AS numwait
      |FROM cand JOIN supplier ON s_suppkey = l_suppkey
      |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 30""".stripMargin

  /** q178 — TPC-H Q2-shaped cheapest offer per part: for every
    * size-15 part, the AFRICA-region supplier line(s) matching that
    * part's regional minimum price (unit price stands in for the
    * supplycost this schema lacks). The correlated min subquery
    * decorrelates to a per-part min aggregate joined back on
    * (part, price) — the classic argmin-within-group rewrite — and
    * the region restriction is applied BEFORE the min (Q2 semantics:
    * the minimum is over the region's offers only). Plan: region →
    * nation → supplier collapses to one broadcast dim map; the
    * size-filtered part keys broadcast to the lineitem scan; the
    * min frame is part-bounded and broadcasts back; ties (two
    * suppliers at the exact minimum cents) are all kept, like Q2. */
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val rg = t(s, dir, "region")
      .filter(col("r_name") === "AFRICA").select(col("r_regionkey"))
    val nat = t(s, dir, "nation")
      .join(broadcast(rg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val sup = t(s, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val pts = t(s, dir, "part").filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val li = t(s, dir, "lineitem")
      .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        cents(col("l_extendedprice")).as("price_fx"))
    val mn = li.groupBy(col("p_partkey").as("mp"))
      .agg(min(col("price_fx")).as("min_fx"))
    li.join(broadcast(mn),
        col("p_partkey") === col("mp") && col("price_fx") === col("min_fx"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"), col("n_name"),
        col("price_fx"))
      .distinct()
      .orderBy(col("price_fx"), col("p_partkey"), col("s_name"))
      .limit(100)
  }

  val minCostSupplierSql: String =
    """WITH rg AS (SELECT n_nationkey, n_name FROM nation
      |  JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'AFRICA'),
      |sup AS (SELECT s_suppkey, s_name, n_name FROM supplier
      |  JOIN rg ON n_nationkey = s_nationkey),
      |pts AS (SELECT p_partkey, p_brand FROM part WHERE p_size = 15),
      |li AS (SELECT p_partkey, p_brand, s_name, n_name,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_fx
      |  FROM lineitem JOIN pts ON p_partkey = l_partkey
      |  JOIN sup ON s_suppkey = l_suppkey),
      |mn AS (SELECT p_partkey AS mp, min(price_fx) AS min_fx
      |  FROM li GROUP BY 1)
      |SELECT DISTINCT p_partkey, p_brand, s_name, n_name, price_fx
      |FROM li JOIN mn ON mp = p_partkey AND price_fx = min_fx
      |ORDER BY price_fx, p_partkey, s_name LIMIT 100""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_waiting_suppliers" -> waitingSuppliers,
    "q178_min_cost_supplier" -> minCostSupplier)

  def oracles: Map[String, String] = Map(
    "q177_waiting_suppliers" -> waitingSuppliersSql,
    "q178_min_cost_supplier" -> minCostSupplierSql)
}
