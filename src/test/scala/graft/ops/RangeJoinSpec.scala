package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Band/range self-join contracts: the range-window form and the
  * skew-safe bucketed form are the same operator, and the band is
  * strict on both edges. */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("window form ≡ bucketed form on the events corpus (24h band)") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.01")
    val d = 86400L * 1000 * 1000 * 1000
    val win = Temporal.priorEventCount(e, "user_id", "ts", d)
      .as[(Long, Long)].collect().toMap
    val bkt = Temporal.priorEventCountBucketed(e, "user_id", "ts", d)
      .as[(Long, Long)].collect().toMap
    assert(win == bkt)
    assert(win.values.sum > 0, "window must be non-trivial on this corpus")
    assert(win.values.exists(_ == 0), "zero-prior events must be present too")
  }

  test("band edges are strict: ties and exactly-Δ gaps don't count") {
    // user 1: events at t=0, 100, 100, 199, 300 with Δ=200:
    //   t=0   → 0 priors
    //   t=100 → 1 (t=0); the OTHER t=100 is a tie, excluded
    //   t=199 → 3 (0, 100, 100)
    //   t=300 → 3 (100, 100, 199) — t=0 is exactly Δ=300-100... no:
    //           300-0=300 ≥ 200 → out; 300-100=200 ≥ 200 → out? No:
    //           strict < Δ: 200 is NOT < 200 → both t=100s are out;
    //           only t=199 (gap 101) counts → 1
    val e = Seq((10L, 1L, 0L), (11L, 1L, 100L), (12L, 1L, 100L),
        (13L, 1L, 199L), (14L, 1L, 300L), (20L, 2L, 100L))
      .toDF("event_id", "user_id", "ts")
    val want = Map(10L -> 0L, 11L -> 1L, 12L -> 1L, 13L -> 3L, 14L -> 1L, 20L -> 0L)
    val win = Temporal.priorEventCount(e, "user_id", "ts", 200L)
      .as[(Long, Long)].collect().toMap
    val bkt = Temporal.priorEventCountBucketed(e, "user_id", "ts", 200L)
      .as[(Long, Long)].collect().toMap
    assert(win == want)
    assert(bkt == want)
  }
}
