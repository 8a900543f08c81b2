package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q123 transition matrix + q124 grouped exact-moment trend. */
class TrendTransitionSpec extends SparkSpec {
  import spark.implicits._

  test("transitionMatrix: counts follow each user's time order") {
    // user 1: a→b→a ; user 2: a→b — transitions: (a,b)×2, (b,a)×1
    val ev = Seq(
      (1L, "a", 100L, 10L), (1L, "b", 200L, 11L), (1L, "a", 300L, 12L),
      (2L, "a", 150L, 20L), (2L, "b", 250L, 21L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Temporal.transitionMatrix(ev, "user_id", "event_type", "ts")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(("a", "b", 2L, 1000000L), ("b", "a", 1L, 1000000L)))
  }

  test("transitionMatrix: row probabilities are exact integer shares") {
    // from 'a': 2×b, 1×c → p = 666666 / 333333 (floor division)
    val ev = Seq(
      (1L, "a", 1L, 1L), (1L, "b", 2L, 2L),
      (2L, "a", 1L, 3L), (2L, "b", 2L, 4L),
      (3L, "a", 1L, 5L), (3L, "c", 2L, 6L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val m = Temporal.transitionMatrix(ev, "user_id", "event_type", "ts")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    assert(m == Map(("a", "b") -> 666666L, ("a", "c") -> 333333L))
  }

  test("transitionMatrix: same-ts ties break on event_id deterministically") {
    val ev = Seq((1L, "x", 100L, 2L), (1L, "y", 100L, 1L), (1L, "z", 200L, 3L))
      .toDF("user_id", "event_type", "ts", "event_id")
    // order: y (id 1) → x (id 2) → z: transitions (y,x), (x,z)
    val got = Temporal.transitionMatrix(ev, "user_id", "event_type", "ts")
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(got == Set(("y", "x"), ("x", "z")))
  }

  test("groupedTrend recovers an exact linear relationship") {
    // y = 2.5 + 0.25x dollars over x = 0..4 hours (ts in nanos)
    val h = 3600L * 1000 * 1000 * 1000
    val ev = (0 to 4).map(i => ("g", i * h, 2.50 + 0.25 * i))
      .toDF("event_type", "ts", "value")
    val row = Aggregates.groupedTrend(ev, "event_type", "ts", "value")
      .as[(String, Long, Long, Long)].head()
    // slope 25 cents/hour → 250000 in 1e-4 units; intercept 250 cents
    assert(row == (("g", 5L, 250000L, 2500000L)))
  }

  test("groupedTrend drops degenerate groups (zero x variance)") {
    val ev = Seq(("g", 100L, 1.0), ("g", 200L, 2.0)) // same hour bucket
      .toDF("event_type", "ts", "value")
    assert(Aggregates.groupedTrend(ev, "event_type", "ts", "value").count() == 0L)
  }

  test("groupedTrend is partition-order invariant (exact moments)") {
    val h = 3600L * 1000 * 1000 * 1000
    val rows = (0 until 500).map(i => ("g", (i % 97) * h, (i % 13) * 1.07))
    val a = Aggregates.groupedTrend(rows.toDF("event_type", "ts", "value")
      .repartition(1), "event_type", "ts", "value")
      .as[(String, Long, Long, Long)].head()
    val b = Aggregates.groupedTrend(scala.util.Random.shuffle(rows)
      .toDF("event_type", "ts", "value").repartition(32),
      "event_type", "ts", "value")
      .as[(String, Long, Long, Long)].head()
    assert(a == b)
  }

  test("decayedEngagement: exact power-of-two decay with age cap") {
    val day = 86400L * 1000 * 1000 * 1000
    val ev = Seq(
      ("a", 30L * day, 1.00),      // age 0  -> w = 2^20
      ("a", 29L * day, 1.00),      // age 1d -> w = 2^19
      ("b", 30L * day - 1, 2.00),  // age <1d -> bucket 0 -> 2^20
      ("c", 0L, 1.00))             // age 30d -> capped at bucket 20 -> w=1
      .toDF("user_id", "ts", "value")
    val got = FeedShapes.decayedEngagement(ev, "user_id", "ts", "value",
        day, maxBuckets = 20, topK = 10)
      .as[(String, Long, Long)].collect().toList
    val w20 = 1L << 20
    assert(got == List(
      ("b", 200L * w20, 1L),
      ("a", 100L * w20 + 100L * (w20 / 2), 2L),
      ("c", 100L, 1L)))
  }

  test("decayedEngagement: score is partition-order invariant") {
    val day = 86400L * 1000 * 1000 * 1000
    val rows = (0 until 1000).map(i =>
      (s"u${i % 7}", (i % 40).toLong * day, (i % 9) * 1.11))
    val a = FeedShapes.decayedEngagement(rows.toDF("user_id", "ts", "value")
      .repartition(1), "user_id", "ts", "value", day).collect().map(_.toSeq).toList
    val b = FeedShapes.decayedEngagement(scala.util.Random.shuffle(rows)
      .toDF("user_id", "ts", "value").repartition(32),
      "user_id", "ts", "value", day).collect().map(_.toSeq).toList
    assert(a == b)
  }

  test("groupedCorr: perfect positive and negative correlation recover ±1e6") {
    val ev = (1 to 40).flatMap(i => Seq(
      ("pos", i.toLong, 2L * i), ("neg", i.toLong, 1000L - 3L * i)))
      .toDF("g", "x", "y")
    val m = Aggregates.groupedCorr(ev, "g", col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(m == Map("pos" -> 1000000L, "neg" -> -1000000L))
  }

  test("groupedCorr drops zero-variance groups by exact predicate") {
    val ev = Seq(("g", 1L, 5L), ("g", 2L, 5L), ("g", 3L, 5L)).toDF("g", "x", "y")
    assert(Aggregates.groupedCorr(ev, "g", col("x"), col("y")).count() == 0L)
  }

  test("activityStreaks: islands split exactly at day gaps") {
    val day = 86400L * 1000 * 1000 * 1000
    // u1 active days {0,1,2, 5,6}, u2 {3} (two events same day)
    val ev = Seq((1L, 0L), (1L, 1L), (1L, 2L), (1L, 5L), (1L, 6L),
      (2L, 3L), (2L, 3L))
      .map { case (u, d) => (u, d * day + 7L) }.toDF("user_id", "ts")
    val got = Temporal.activityStreaks(ev, "user_id", "ts")
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((1L, 5L, 3L), (2L, 1L, 1L)))
  }

  test("rollingActiveUsers: WAU counts trailing-7-day distinct users") {
    val day = 86400L * 1000 * 1000 * 1000
    // day 0: u1; day 3: u2; day 8: u1
    val ev = Seq((1L, 0L), (2L, 3L), (1L, 8L))
      .map { case (u, d) => (u, d * day) }.toDF("user_id", "ts")
    val got = Temporal.rollingActiveUsers(ev, "user_id", "ts")
      .as[(Long, Long, Long)].collect().toList
    // day 0: dau 1, wau {u1}; day 3: dau 1, wau {u1,u2};
    // day 8: dau 1, wau {u2 (day3+5<..day8? 8-3=5 <=6 yes), u1}
    assert(got == List((0L, 1L, 1L), (3L, 1L, 2L), (8L, 1L, 2L)))
  }

  test("rollingActiveUsers: users expire from the window after 7 days") {
    val day = 86400L * 1000 * 1000 * 1000
    val ev = Seq((1L, 0L), (2L, 10L))
      .map { case (u, d) => (u, d * day) }.toDF("user_id", "ts")
    val got = Temporal.rollingActiveUsers(ev, "user_id", "ts")
      .as[(Long, Long, Long)].collect().toList
    assert(got == List((0L, 1L, 1L), (10L, 1L, 1L)))
  }

  test("chiSquareDrift: hand-computed 2x2 statistic; equal split is 0") {
    // g1: cats a/b x periods 0/1 = 10,10,10,30 -> chi2 = 3.75, dof 1
    // g2: perfectly proportional -> chi2 = 0
    val rows =
      Seq.fill(10)(("g1", "a", 0)) ++ Seq.fill(10)(("g1", "b", 0)) ++
      Seq.fill(10)(("g1", "a", 1)) ++ Seq.fill(30)(("g1", "b", 1)) ++
      Seq.fill(5)(("g2", "a", 0)) ++ Seq.fill(10)(("g2", "b", 0)) ++
      Seq.fill(10)(("g2", "a", 1)) ++ Seq.fill(20)(("g2", "b", 1))
    val ev = rows.toDF("g", "cat", "per")
    val got = Aggregates.chiSquareDrift(ev, "g", col("cat"), col("per"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got("g2") == ((45L, 1L, 0L)))
    val (n1, dof1, chi1) = got("g1")
    assert(n1 == 60L && dof1 == 1L && math.abs(chi1 - 3750000L) <= 3L)
  }

  test("chiSquareDrift: a category vanishing in one period contributes its E term") {
    // cat a: 10/10 across periods; cat b: 10/0 — the zero cell (b,1)
    // has E = 10*10/30 and must contribute (0-E)^2/E = E = 3.3333.
    // Full grid: chi2 = 0.8333 + 1.6667 + 1.6667 + 3.3333 = 7.5
    // (observed-cells-only would understate it as 4.1667).
    val rows =
      Seq.fill(10)(("g1", "a", 0)) ++ Seq.fill(10)(("g1", "a", 1)) ++
      Seq.fill(10)(("g1", "b", 0))
    val ev = rows.toDF("g", "cat", "per")
    val r = Aggregates.chiSquareDrift(ev, "g", col("cat"), col("per"))
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 30L && r(0).getLong(2) == 1L)
    assert(math.abs(r(0).getLong(3) - 7500000L) <= 5L)
  }

  test("transitionMatrix / lastTouchAttribution accept a custom tiebreak column") {
    val ev = Seq(
      (1L, "view", 1L, 10L), (1L, "click", 1L, 20L), (1L, "purchase", 2L, 30L))
      .toDF("user_id", "event_type", "ts", "row_id")
    val tm = Temporal.transitionMatrix(ev, "user_id", "event_type", "ts",
        tieCol = "row_id")
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(tm == Set("view" -> "click", "click" -> "purchase"))
    val lt = Temporal.lastTouchAttribution(ev, "user_id", "event_type", "ts",
        "purchase", tieCol = "row_id")
      .as[(String, Long)].collect().toMap
    assert(lt == Map("click" -> 1L))
  }

  test("lastTouchAttribution: credits the last prior non-conversion touch") {
    val ev = Seq(
      (1L, "view", 1L, 1L), (1L, "click", 2L, 2L),
      (1L, "purchase", 3L, 3L), (1L, "purchase", 4L, 4L),
      (2L, "purchase", 1L, 5L),
      (3L, "view", 1L, 6L), (3L, "purchase", 2L, 7L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val got = Temporal.lastTouchAttribution(ev, "user_id", "event_type",
        "ts", "purchase")
      .as[(String, Long)].collect().toMap
    assert(got == Map("click" -> 2L, "(none)" -> 1L, "view" -> 1L))
  }
}
