package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Event-time stream analytics (ST8/ST9 — absent in the reference,
  * exposed per the north star: the reference's `created_at` is
  * producer wall-clock with no event-time aggregation, SURVEY §2.4).
  *
  * All transforms work identically on batch and streaming DataFrames
  * (same Catalyst plans); the specs drive them through MemoryStream
  * with controlled watermarks.
  */
object StreamOps {

  /** Tumbling-window throughput (A6 generalized to event time):
    * counts + sums per window, emitted once the watermark passes the
    * window end (append mode). */
  def windowedThroughput(events: DataFrame, tsCol: String,
      watermarkDelay: String, windowLen: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("n_events"), col("sum_value"))

  /** Sliding-window variant (overlapping windows). */
  def slidingThroughput(events: DataFrame, tsCol: String,
      watermarkDelay: String, windowLen: String, slide: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen, slide))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Session windows: activity grouped by gaps ≥ `gap` per user. */
  def sessionize(events: DataFrame, tsCol: String, userCol: String,
      watermarkDelay: String, gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Cross-batch dedup with bounded state (ST2 at stream level):
    * drops re-deliveries of the same key until the watermark passes —
    * state is evicted, unlike an unbounded dropDuplicates. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String,
      watermarkDelay: String, keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream inner join with an event-time interval bound —
    * the canonical two-stream correlation (e.g. posts ⋈ engagement
    * events within an attribution window). Both sides carry
    * watermarks, and the time-range predicate is what lets Spark
    * EVICT join state: left rows older than
    * (right watermark − interval) and right rows older than the left
    * watermark can never match again and are dropped, so state stays
    * bounded — an unconstrained stream-stream join would buffer both
    * streams forever.
    *
    * `leftTs`/`rightTs` name each side's event-time column; a right
    * row joins a left row when it lands in [leftTs, leftTs +
    * interval]. The sides are aliased `l`/`r` and the predicate is
    * qualified, so the two streams may share key/timestamp column
    * names without an AMBIGUOUS_REFERENCE failure (the joined frame
    * then carries both same-named columns — select via `l.x`/`r.x`). */
  def intervalJoin(left: DataFrame, leftTs: String, leftKey: String,
      right: DataFrame, rightTs: String, rightKey: String,
      watermarkDelay: String, interval: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$leftKey") === col(s"r.$rightKey") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $interval"))
  }

  /** Custom keyed state via mapGroupsWithState (ST9): running per-key
    * aggregate (count + running max of a value) maintained across
    * micro-batches — the shape used for CAS emulation and per-entity
    * counters. Update output mode. */
  case class KeyedEvent(key: String, value: Double)
  case class KeyedTotals(key: String, n: Long, maxValue: Double)

  def runningTotals(events: Dataset[KeyedEvent])(
      implicit e1: Encoder[KeyedTotals],
      e2: Encoder[String]): Dataset[KeyedTotals] =
    events.groupByKey(_.key)
      .mapGroupsWithState[KeyedTotals, KeyedTotals](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[KeyedEvent], state: GroupState[KeyedTotals]) =>
          val prev = state.getOption.getOrElse(KeyedTotals(key, 0L, Double.MinValue))
          val next = rows.foldLeft(prev) { (acc, r) =>
            KeyedTotals(key, acc.n + 1, math.max(acc.maxValue, r.value))
          }
          state.update(next)
          next
      }
}
