package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Date/time scalar family + batch sessionization.
  *
  * q51 is the interesting one: Spark's `session_window` (used
  * streaming in StreamOps.sessionize) runs in BATCH here and is
  * hash-verified against a first-principles gaps-and-islands oracle
  * (lag + cumulative flag sum) — certifying the session semantics
  * themselves: an event extends a session iff it starts strictly
  * inside predecessor's [ts, ts+gap) window.
  */
object Temporal {

  /** Date arithmetic/extraction family (SC-family widening). */
  def dateMath(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("days_to_2002"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"))
      .orderBy(col("o_orderkey"))

  val dateMathSql: String =
    """SELECT o_orderkey,
      |  CAST(date_part('year', o_orderdate) AS INT) AS yr,
      |  CAST(date_part('month', o_orderdate) AS INT) AS mo,
      |  CAST(date_part('day', o_orderdate) AS INT) AS dom,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
      |FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""".stripMargin

  /** Batch sessionization: session_window(ts, 30 min) per user over
    * events, emitted as (user, session_start_us, n_events). */
  def sessions(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(session_window(col("ts_utc"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("session_start_us"))

  // Gaps-and-islands: new session when ts - prev_ts >= 30 min.
  val sessionsSql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |flagged AS (SELECT user_id, us,
      |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
      |      >= 30 * 60 * 1000000 THEN 1 ELSE 0 END AS new_s
      |  FROM e),
      |grp AS (SELECT user_id, us,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
      |FROM grp GROUP BY user_id, sid
      |ORDER BY user_id, session_start_us""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_date_math" -> dateMath,
    "q51_sessions" -> sessions)

  def oracles: Map[String, String] = Map(
    "q50_date_math" -> dateMathSql,
    "q51_sessions" -> sessionsSql)
}
