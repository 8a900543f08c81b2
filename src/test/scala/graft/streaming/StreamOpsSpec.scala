package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Event-time semantics through real StreamingQueries (MemoryStream →
  * memory sink), with controlled watermark advancement. */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private var sinkId = 0
  private def nextSink(): String = { sinkId += 1; s"streamops_sink_$sinkId" }

  case class Ev(ts: Timestamp, user: String, value: Double)
  case class Msg(ts: Timestamp, id: String)

  test("tumbling windows emit only after the watermark passes (ST8, append mode)") {
    val in = memStream[Ev]
    val out = StreamOps.windowedThroughput(in.toDF(), "ts", "10 seconds", "1 minute")
    val sink = nextSink()
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev(ts("2026-01-01 00:00:10"), "u1", 10.0),
        Ev(ts("2026-01-01 00:00:40"), "u2", 5.0))
      q.processAllAvailable()
      // watermark hasn't passed 00:01:00 yet → nothing emitted
      assert(spark.table(sink).isEmpty)
      // an event far ahead pushes the watermark past the first window
      in.addData(Ev(ts("2026-01-01 00:05:00"), "u3", 1.0))
      q.processAllAvailable()
      in.addData(Ev(ts("2026-01-01 00:10:00"), "u3", 1.0))
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select(col("window_start").cast("string"), col("n_events"), col("sum_value"))
        .as[(String, Long, Double)].collect().toSet
      assert(rows.contains(("2026-01-01 00:00:00", 2L, 15.0)))
    } finally q.stop()
  }

  test("late event beyond the watermark is dropped (ST8)") {
    val in = memStream[Ev]
    val sink = nextSink()
    val q = StreamOps.windowedThroughput(in.toDF(), "ts", "10 seconds", "1 minute")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Ev(ts("2026-01-01 00:00:30"), "u1", 1.0))
      q.processAllAvailable()
      in.addData(Ev(ts("2026-01-01 00:30:00"), "u1", 1.0)) // watermark → 00:29:50
      q.processAllAvailable()
      in.addData(Ev(ts("2026-01-01 00:00:45"), "u1", 99.0)) // hopelessly late
      q.processAllAvailable()
      in.addData(Ev(ts("2026-01-01 01:00:00"), "u1", 1.0)) // flush second window
      q.processAllAvailable()
      val first = spark.table(sink)
        .filter(col("window_start") === ts("2026-01-01 00:00:00"))
        .select(col("n_events")).as[Long].collect().toSeq
      assert(first == Seq(1L)) // the late 99.0 event did NOT land
    } finally q.stop()
  }

  test("session windows split on gaps per user (ST9 via session_window)") {
    val in = memStream[Ev]
    val sink = nextSink()
    val q = StreamOps.sessionize(in.toDF(), "ts", "user", "10 seconds", "30 seconds")
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Ev(ts("2026-01-01 00:00:00"), "u1", 1), Ev(ts("2026-01-01 00:00:20"), "u1", 1),
        Ev(ts("2026-01-01 00:02:00"), "u1", 1), // gap > 30s → new session
        Ev(ts("2026-01-01 00:00:05"), "u2", 1))
      q.processAllAvailable()
      in.addData(Ev(ts("2026-01-01 01:00:00"), "zz", 1)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table(sink)
        .select(col("user"), col("session_start").cast("string"), col("n_events"))
        .as[(String, String, Long)].collect().toSet
      assert(rows == Set(
        ("u1", "2026-01-01 00:00:00", 2L),
        ("u1", "2026-01-01 00:02:00", 1L),
        ("u2", "2026-01-01 00:00:05", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark masks redelivery across batches (ST2)") {
    val in = memStream[Msg]
    val sink = nextSink()
    val q = StreamOps.dedupWithinWatermark(in.toDF(), "ts", "1 minute", Seq("id"))
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Msg(ts("2026-01-01 00:00:00"), "a"), Msg(ts("2026-01-01 00:00:01"), "a"))
      q.processAllAvailable()
      in.addData(Msg(ts("2026-01-01 00:00:02"), "a")) // redelivery, inside watermark
      q.processAllAvailable()
      assert(spark.table(sink).count() == 1)
    } finally q.stop()
  }

  case class PostEv(p_ts: Timestamp, post_id: String)
  case class ClickEv(c_ts: Timestamp, click_post: String, who: String)

  test("stream-stream interval join: matches inside the window, not outside; state evicted") {
    val posts = memStream[PostEv]
    val clicks = memStream[ClickEv]
    val sink = nextSink()
    val joined = StreamOps.intervalJoin(
      posts.toDF(), "p_ts", "post_id",
      clicks.toDF(), "c_ts", "click_post",
      watermarkDelay = "10 seconds", interval = "1 MINUTE")
    val q = joined.writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Append()).start()
    try {
      posts.addData(PostEv(ts("2026-01-01 00:00:00"), "p1"))
      clicks.addData(
        ClickEv(ts("2026-01-01 00:00:30"), "p1", "u1"),  // inside [0s, 60s]
        ClickEv(ts("2026-01-01 00:02:00"), "p1", "u2"),  // outside the interval
        ClickEv(ts("2026-01-01 00:00:10"), "px", "u3"))  // different key
      q.processAllAvailable()
      val rows = spark.table(sink).select(col("post_id"), col("who"))
        .as[(String, String)].collect().toSet
      assert(rows == Set(("p1", "u1")))
      // a matching click arriving while state is live still joins
      clicks.addData(ClickEv(ts("2026-01-01 00:00:50"), "p1", "u4"))
      q.processAllAvailable()
      assert(spark.table(sink).count() == 2)
    } finally q.stop()
  }

  test("kmv_distinct Aggregator composes with streaming windowed aggregation (complete ≡ batch)") {
    import graft.ops.Aggregates
    import graft.functions.SketchAggs
    val in = memStream[Ev]
    val sink = nextSink()
    val agg = (df: org.apache.spark.sql.DataFrame) => df
      .groupBy(window(col("ts"), "1 minute").getField("start").as("w"))
      .agg(round(SketchAggs.kmv_distinct(
        Aggregates.kmvHash(col("user")), 64), 2).as("est"))
    val q = agg(in.toDF()).writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Complete()).start()
    try {
      val evs = Seq(
        Ev(ts("2026-01-01 00:00:05"), "u1", 1.0),
        Ev(ts("2026-01-01 00:00:10"), "u2", 1.0),
        Ev(ts("2026-01-01 00:00:20"), "u1", 1.0), // dup user, same window
        Ev(ts("2026-01-01 00:01:10"), "u3", 1.0))
      in.addData(evs.take(2)); q.processAllAvailable()
      in.addData(evs.drop(2)); q.processAllAvailable()
      val streamed = spark.table(sink).as[(Timestamp, Double)].collect().toMap
      val batch = agg(evs.map(e => (e.ts, e.user)).toDF("ts", "user"))
        .as[(Timestamp, Double)].collect().toMap
      assert(streamed == batch && batch.size == 2)
      assert(streamed(ts("2026-01-01 00:00:00")) == 2.0, "sub-k estimate is exact distinct")
    } finally q.stop()
  }

  test("mapGroupsWithState running totals survive across batches (ST9 custom state)") {
    val in = memStream[StreamOps.KeyedEvent]
    val sink = nextSink()
    val q = StreamOps.runningTotals(in.toDS())
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(StreamOps.KeyedEvent("k1", 5.0), StreamOps.KeyedEvent("k1", 7.0))
      q.processAllAvailable()
      in.addData(StreamOps.KeyedEvent("k1", 3.0), StreamOps.KeyedEvent("k2", 1.0))
      q.processAllAvailable()
      val last = spark.table(sink).groupBy(col("key"))
        .agg(max(col("n")).as("n"), max(col("maxValue")).as("mx"))
        .as[(String, Long, Double)].collect()
        .map { case (k, n, m) => k -> (n, m) }.toMap
      assert(last("k1") == (3L, 7.0))
      assert(last("k2") == (1L, 1.0))
    } finally q.stop()
  }
}
