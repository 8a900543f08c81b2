package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational core operators (SURVEY.md §2.2) and the join family
  * (§2.3), expressed over the testdata corpus.
  *
  * Every query here is declarative DataFrame code — Catalyst provides
  * predicate pushdown, column pruning and join selection; `.explain`
  * on each shows filters reaching the parquet scan (`PushedFilters`)
  * and broadcast joins for the dimension sides.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  /** TPC-H Q1-shaped pricing summary — grouped aggregation with
    * map-side partial aggregation; the engine analogue of the
    * reference's bench counters (A1/A7, bench/http_load/http_load.go:86-130).
    * Scale: partial agg before shuffle; 4 groups → tiny reduce side. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Point lookup by unique key (R1 — reference username lookup,
    * internal/store/feed.go:14-28). Predicate pushes to the parquet
    * scan; on a partitioned warehouse this is partition pruning. */
  def pointLookup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") === lit(42L))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  val pointLookupSql: String =
    "SELECT c_custkey, c_name, c_mktsegment FROM customer WHERE c_custkey = 42"

  /** Partition scan (R2 — reference followers-of-X scan,
    * internal/store/feed.go:92-111): filter on a low-cardinality key,
    * project two columns. ReadSchema shows only 3 columns scanned. */
  def filterScan(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type") === lit("purchase") && col("user_id") < lit(25L))
      .select(col("event_id"), col("user_id"), round(col("value"), 2).as("value"))

  val filterScanSql: String =
    """SELECT event_id, user_id, round(value, 2) AS value
      |FROM events WHERE event_type = 'purchase' AND user_id < 25""".stripMargin

  /** Top-K per key (R3 — reference `feed_by_user ... LIMIT n` with
    * clustering order created_at DESC,
    * migrations/cassandra/000001_init_tables.up.cql:30-37). The
    * all-users form: row_number over (user_id, ts DESC). `ts` is exact
    * nanos so ordering matches DuckDB bit-for-bit; event_id breaks ties
    * deterministically. */
  def topKPerUser(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.load(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= lit(3))
      .select(col("user_id"), col("rn"), col("event_id"),
        expr("ts div 1000").as("ts_us"), col("event_type"))
  }

  val topKPerUserSql: String =
    """SELECT user_id, rn, event_id, ts_us, event_type FROM (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn <= 3""".stripMargin

  /** Single-key top-K (R3 point form — `WHERE user_id = ? LIMIT n`).
    * Plans as TakeOrderedAndProject: no full sort, O(n log k). */
  def feedTopK(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("user_id") === lit(7L))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(10)
      .select(col("event_id"), expr("ts div 1000").as("ts_us"), col("event_type"),
        round(col("value"), 2).as("value"))

  val feedTopKSql: String =
    """SELECT event_id, epoch_us(ts) AS ts_us, event_type, round(value, 2) AS value
      |FROM events WHERE user_id = 7
      |ORDER BY ts DESC, event_id DESC LIMIT 10""".stripMargin

  /** Inner equi-join + aggregation (F1's join shape in batch form:
    * stream side ⋈ dimension). customer is the small side — Catalyst
    * broadcasts it (autoBroadcastJoinThreshold), so no shuffle of
    * orders at scale. */
  def joinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))

  val joinAggSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Left-anti join (F5 delivery-verification shape,
    * bench/e2e_bench/e2e_bench.go:175-232, and A5/R7 existence-check,
    * cmd/server/httphandlers.go:39-56): customers with no orders. */
  def antiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Left-semi join (EXISTS — the positive half of R7). */
  def semiJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))

  val semiJoinSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin

  /** Multi-way join through the star schema (supplier→nation→region)
    * — both dims broadcast; zero shuffles on the fact side. */
  def starJoin(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        round(avg(col("s_acctbal")), 4).as("avg_acctbal"))
      .orderBy(col("r_name"), col("n_name"))

  val starJoinSql: String =
    """SELECT r_name, n_name, count(*) AS n_suppliers,
      |  round(avg(s_acctbal), 4) AS avg_acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Grouped collect-to-list (A9 adjacency-list layout,
    * bench/e2e_bench/e2e_bench.go:103-124). collect_list order is
    * nondeterministic in a distributed run, so the list is sorted and
    * joined to one string — same canonical form as the oracle's
    * ordered string_agg. */
  def groupCollect(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .filter(col("user_id") < lit(20L))
      .groupBy(col("user_id"))
      .agg(array_join(array_sort(collect_list(col("event_type"))), ",")
        .as("event_types"))
      .orderBy(col("user_id"))

  val groupCollectSql: String =
    """SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS event_types
      |FROM events WHERE user_id < 20 GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Window-function family beyond row_number (rank/dense_rank/lag —
    * exposed natively per SURVEY §2.6 note). */
  def windowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    t(s, dir, "supplier")
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("prev_bal", round(lag(col("s_acctbal"), 1).over(w), 2))
      .filter(col("rk") <= lit(3))
      .select(col("s_nationkey"), col("rk"), col("drk"), col("s_suppkey"),
        round(col("s_acctbal"), 2).as("acctbal"), col("prev_bal"))
  }

  val windowRankSql: String =
    """SELECT s_nationkey, rk, drk, s_suppkey, round(s_acctbal, 2) AS acctbal, prev_bal
      |FROM (
      |  SELECT s_nationkey, s_suppkey, s_acctbal,
      |    rank() OVER w AS rk, dense_rank() OVER w AS drk,
      |    round(lag(s_acctbal, 1) OVER w, 2) AS prev_bal
      |  FROM supplier
      |  WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey))
      |WHERE rk <= 3""".stripMargin

  /** Set operations (SURVEY §2.7): customers appearing in both halves
    * of a split (INTERSECT) minus an exclusion set (EXCEPT). */
  def setOps(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val early = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val late = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    val high = o.filter(col("o_totalprice") > lit(400000.0)).select(col("o_custkey"))
    early.intersect(late).except(high).withColumnRenamed("o_custkey", "custkey")
  }

  val setOpsSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 400000""".stripMargin

  /** Window frames: running sum + moving average over an ordered
    * frame (rowsBetween — the frame family SURVEY §2.6 exposes via
    * Spark). */
  def runningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, dir, "events")
      .filter(col("user_id") < 10)
      .withColumn("running_sum",
        round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("moving_avg3",
        round(avg(col("value")).over(w.rowsBetween(-2, 0)), 4))
      .select(col("user_id"), col("event_id"), col("running_sum"), col("moving_avg3"))
  }

  val runningSumSql: String =
    """SELECT user_id, event_id,
      |  round(sum(value) OVER w, 2) AS running_sum,
      |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
      |FROM events WHERE user_id < 10
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Correlated scalar subquery — customers whose average order value
    * exceeds their segment's average (Catalyst decorrelates to a
    * join, SURVEY §4). */
  def aboveSegmentAvg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val perCust = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(avg(col("o_totalprice")).as("cust_avg"),
        sum(col("o_totalprice")).as("cust_total"), count(lit(1)).as("n_orders"))
    val perSeg = perCust.groupBy(col("c_mktsegment").as("seg"))
      .agg(avg(col("cust_avg")).as("seg_avg"))
    perCust.join(broadcast(perSeg), col("c_mktsegment") === col("seg"))
      .filter(col("cust_avg") > col("seg_avg"))
      // output the SUM, not the avg: averages of 2-decimal money values
      // sit exactly on rounding boundaries, so cross-engine 1-ulp sum
      // differences flip round(avg, 2); the sum's true value is on the
      // 2-decimal grid, making the round boundary-free.
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("cust_total"), 2).as("cust_total"), col("n_orders"))
      .orderBy(col("c_custkey"))
  }

  val aboveSegmentAvgSql: String =
    """WITH pc AS (SELECT c_custkey, c_mktsegment, avg(o_totalprice) AS cust_avg,
      |    sum(o_totalprice) AS cust_total, count(*) AS n_orders
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY c_custkey, c_mktsegment)
      |SELECT c_custkey, c_mktsegment, round(cust_total, 2) AS cust_total, n_orders
      |FROM pc p
      |WHERE cust_avg > (SELECT avg(cust_avg) FROM pc
      |  WHERE c_mktsegment = p.c_mktsegment)
      |ORDER BY c_custkey""".stripMargin

  /** R3 all-users top-K via the bounded TopKPairs Aggregator —
    * map-side partial heaps instead of the window's full shuffle+sort
    * (q04 is the window form; both must match the same oracle). */
  def topKPerUserAgg(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(graft.functions.TopKAgg.top_k_pairs(col("ts"), col("event_id"), 3).as("tk"))
      .select(col("user_id"), posexplode(col("tk")))
      .select(col("user_id"), (col("pos") + 1).as("rn"),
        col("col._2").as("event_id"), expr("col._1 div 1000").as("ts_us"))
      .orderBy(col("user_id"), col("rn"))

  val topKPerUserAggSql: String =
    """SELECT user_id, rn, event_id, ts_us FROM (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) WHERE rn <= 3 ORDER BY user_id, rn""".stripMargin

  /** Left outer join with null-aware aggregation: every customer,
    * order count 0 when none (completes the outer-join family). */
  def leftJoinAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total"))
      .filter(col("c_custkey") < 400)
      .orderBy(col("c_custkey"))

  val leftJoinAggSql: String =
    """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders,
      |  round(coalesce(sum(o_totalprice), 0.0), 2) AS total
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |WHERE c_custkey < 400
      |GROUP BY c_custkey, c_mktsegment ORDER BY c_custkey""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_left_join_agg" -> leftJoinAgg,
    "q52_topk_agg" -> topKPerUserAgg,
    "q42_running_sum" -> runningSum,
    "q43_above_segment_avg" -> aboveSegmentAvg,
    "q01_pricing_summary" -> pricingSummary,
    "q02_point_lookup" -> pointLookup,
    "q03_filter_scan" -> filterScan,
    "q04_topk_per_user" -> topKPerUser,
    "q05_feed_topk" -> feedTopK,
    "q06_join_agg" -> joinAgg,
    "q07_anti_join" -> antiJoin,
    "q08_semi_join" -> semiJoin,
    "q09_star_join" -> starJoin,
    "q10_group_collect" -> groupCollect,
    "q11_window_rank" -> windowRank,
    "q12_set_ops" -> setOps)

  def oracles: Map[String, String] = Map(
    "q54_left_join_agg" -> leftJoinAggSql,
    "q52_topk_agg" -> topKPerUserAggSql,
    "q42_running_sum" -> runningSumSql,
    "q43_above_segment_avg" -> aboveSegmentAvgSql,
    "q01_pricing_summary" -> pricingSummarySql,
    "q02_point_lookup" -> pointLookupSql,
    "q03_filter_scan" -> filterScanSql,
    "q04_topk_per_user" -> topKPerUserSql,
    "q05_feed_topk" -> feedTopKSql,
    "q06_join_agg" -> joinAggSql,
    "q07_anti_join" -> antiJoinSql,
    "q08_semi_join" -> semiJoinSql,
    "q09_star_join" -> starJoinSql,
    "q10_group_collect" -> groupCollectSql,
    "q11_window_rank" -> windowRankSql,
    "q12_set_ops" -> setOpsSql)
}
