package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of join — for each left row, the most recent right row at or
  * before its timestamp, per key. Spark has no built-in; preference
  * order (a) applies: COMPOSE built-ins instead of a custom physical
  * operator — tag both sides, union, and carry the right side's value
  * forward with `last(..., ignoreNulls)` over an ordered window. One
  * shuffle (the window partitioning), no join at all; at 100 TB this
  * beats any range-join formulation because the union sorts once per
  * key instead of probing per row.
  *
  * Tie rule: a right row at exactly the left row's timestamp IS
  * visible (<= semantics) — right sorts before left at equal ts.
  */
object AsOf {

  /** leftDf/rightDf must share keyCol + tsCol; rightValueCol is the
    * carried value. Returns leftDf's rows + `asof_<rightValueCol>`. */
  def asofJoin(leftDf: DataFrame, rightDf: DataFrame, keyCol: String,
      tsCol: String, rightValueCol: String): DataFrame = {
    val leftCols = leftDf.columns
    val l = leftDf.withColumn("_side", lit(1))
      .withColumn("_rv", lit(null).cast(rightDf.schema(rightValueCol).dataType))
    val r = rightDf.select(
      col(keyCol), col(tsCol), lit(0).as("_side"), col(rightValueCol).as("_rv"))
    val unioned = l.select((leftCols.map(col) :+ col("_side") :+ col("_rv")): _*)
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side")) // right (0) before left (1) at equal ts
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn(s"asof_$rightValueCol", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_rv")
  }

  /** Gate query: each purchase event joined to the user's most recent
    * click value at-or-before it. */
  def purchaseAsofClick(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value"), 2).as("purchase_value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), round(col("value"), 2).as("click_value"))
    asofJoin(purchases, clicks, "user_id", "ts", "click_value")
      .select(col("user_id"), col("event_id"),
        expr("ts div 1000").as("ts_us"),
        col("purchase_value"), col("asof_click_value"))
      .orderBy(col("user_id"), col("ts_us"))
  }

  // Oracle mirrors the same tagged-union window formulation.
  val purchaseAsofClickSql: String =
    """WITH u AS (
      |  SELECT user_id, ts, event_id, round(value, 2) AS purchase_value,
      |    1 AS side, NULL::DOUBLE AS rv
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT user_id, ts, NULL, NULL, 0, round(value, 2)
      |  FROM events WHERE event_type = 'click'),
      |w AS (SELECT *, last_value(rv IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, side
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_click_value
      |  FROM u)
      |SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  purchase_value, asof_click_value
      |FROM w WHERE side = 1 ORDER BY user_id, ts_us""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q49_asof_join" -> purchaseAsofClick)

  def oracles: Map[String, String] = Map(
    "q49_asof_join" -> purchaseAsofClickSql)
}
