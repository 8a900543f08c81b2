package graft.streaming

import graft.SparkSpec
import graft.ops.Analytics
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

case class AnalyticsStreamEv(event_id: Long, ts: Long, user_id: Long,
    event_type: String)

case class EwmaEv(user_id: Long, day: Long)

/** Streaming twins for the round-8 analytics family. */
class AnalyticsStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = AnalyticsStreamEv
  private val Ev = AnalyticsStreamEv

  private val base = 1_700_000_000_000_000L // epoch micros
  private def ev(u: Long, id: Long, t: String, offsetMin: Long) =
    Ev(id, (base + offsetMin * 60_000_000L) * 1000L, u, t)

  private def withTsUtc(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))

  test("sessionPathsStreaming: closed sessions emit batch-identical paths") {
    val rows = Seq(
      ev(1, 1, "view", 0), ev(1, 2, "click", 1), ev(1, 3, "purchase", 2),
      ev(2, 4, "view", 0), ev(2, 5, "click", 40)) // user 2: two sessions
    val in = memStream[Ev]
    val q = Analytics.sessionPathsStreaming(withTsUtc(in.toDF()),
        "user_id", "event_type", "30 minutes", maxSteps = 5,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("stream_paths")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far past every session gap so all close
      in.addData(ev(99, 100, "view", 10_000))
      q.processAllAvailable()
      val streamed = spark.table("stream_paths")
        .filter(col("user_id") =!= 99)
        .select("user_id", "path").as[(Long, String)].collect().toSet
      val batch = Analytics.sessionPathsOf(withTsUtc(rows.toDF()),
          "user_id", "event_type", "30 minutes", maxSteps = 5, topK = 100)
        .as[(String, Long)].collect().toMap
      assert(streamed == Set(
        (1L, "view>click>purchase"), (2L, "view"), (2L, "click")))
      // the downstream histogram over closed sessions matches batch
      val hist = streamed.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      assert(hist == batch)
    } finally q.stop()
  }

  test("ewmaStreaming: stateful per-user EWMA converges to batch across any split") {
    import graft.ops.Temporal
    // user 1: days 1,2,3 with counts 1,2,4 (day 3 split across batches)
    // user 2: single day
    val batch1 = Seq(EwmaEv(1, 1), EwmaEv(1, 2), EwmaEv(1, 2), EwmaEv(1, 3))
    val batch2 = Seq(EwmaEv(1, 3), EwmaEv(1, 3), EwmaEv(1, 3), EwmaEv(2, 7))
    val in = memStream[EwmaEv]
    val q = Temporal.ewmaStreaming(in.toDF(), "user_id", "day")
      .writeStream.format("memory").queryName("stream_ewma")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()
      // keep only each user's LAST update (memory sink appends updates)
      val streamed = spark.table("stream_ewma")
        .groupBy(col("user_id"))
        .agg(max(struct(col("day"), col("ewma_fx"))).as("s"))
        .select(col("user_id"), col("s.day"), col("s.ewma_fx"))
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val ud = (batch1 ++ batch2).toDF()
        .groupBy(col("user_id"), col("day")).agg(count(lit(1)).as("cnt"))
      val batch = Temporal.ewmaOf(ud)
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(streamed == batch)
      // hand value: user 1 wsum = 4*16384 + 2*12288 + 1*9216 = 99328
      assert(streamed(1L) == ((3L, 1515625L)))
    } finally q.stop()
  }

  test("streaming mode counts (complete mode) feed the same argmax as batch") {
    val in = memStream[Ev]
    val counts = in.toDF()
      .groupBy(col("user_id"), col("event_type").as("mode_type"))
      .agg(count(lit(1)).as("n_mode"))
    val q = counts.writeStream.format("memory").queryName("stream_mode")
      .outputMode(OutputMode.Complete()).start()
    try {
      in.addData(ev(1, 1, "b", 0), ev(1, 2, "a", 1))
      q.processAllAvailable()
      in.addData(ev(1, 3, "a", 2), ev(2, 4, "z", 0))
      q.processAllAvailable()
      val fromStream = spark.table("stream_mode")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
            .orderBy(col("n_mode").desc, col("mode_type"))))
        .filter(col("rk") === 1).drop("rk")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      val batchRows = Seq(ev(1, 1, "b", 0), ev(1, 2, "a", 1),
        ev(1, 3, "a", 2), ev(2, 4, "z", 0)).toDF()
      val fromBatch = Analytics.modePerGroup(batchRows, "user_id", "event_type")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(fromStream == fromBatch)
      assert(fromStream(1L) == (("a", 2L)))
    } finally q.stop()
  }
}
