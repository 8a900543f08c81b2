package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Invariants of the trimmed statistics (SURVEY §5.2 item 2), mirroring
  * reference semantics from bench/e2e_bench/e2e_bench.go:260-305.
  * Property-style via seeded random vectors (no scalatest-scalacheck
  * bridge in the offline dependency set). */
class TrimmedStatsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randVec(maxLen: Int): Array[Double] =
    Array.fill(rnd.nextInt(maxLen))(rnd.nextDouble() * 2e6 - 1e6)

  test("empty input → 0 (reference :261-262, :293-294)") {
    assert(TrimmedStats.trimmedMean(Array.empty, 1.0) == 0.0)
    assert(TrimmedStats.trimmedPercentile(Array.empty, 50, 1.0) == 0.0)
    assert(TrimmedStats.percentile(Array.empty, 99) == 0.0)
  }

  test("trim=0 equals plain mean; trimmed mean within [min, max]") {
    for (_ <- 1 to 200) {
      val xs = randVec(300)
      if (xs.nonEmpty) {
        val plain = xs.sum / xs.length
        assert(math.abs(TrimmedStats.trimmedMean(xs, 0.0) - plain) <= math.abs(plain) * 1e-12 + 1e-9)
        val tm = TrimmedStats.trimmedMean(xs, 10.0)
        assert(tm >= xs.min - 1e-9 && tm <= xs.max + 1e-9)
      }
    }
  }

  test("over-trim caps at n/2 (reference :266-268); empty slice → 0 not NaN") {
    // n=4, trim 90% → trim=3, 3*2>=4 → trim=2 → empty slice. The Go code
    // would yield 0/0=NaN here; our mean() defines it as 0 (documented
    // extension — unreachable at the reference's 1% default).
    val t = TrimmedStats.trim(Array(1.0, 2.0, 3.0, 4.0), 90.0)
    assert(t.isEmpty)
    assert(TrimmedStats.mean(t) == 0.0)
    // n=5 → cap 2 → single middle element survives
    assert(TrimmedStats.trimmedMean(Array(1.0, 2.0, 3.0, 4.0, 100.0), 90.0) == 3.0)
  }

  test("percentile endpoints and interpolation match the Go formula") {
    val xs = Array(10.0, 20.0, 30.0, 40.0)
    assert(TrimmedStats.percentile(xs, 0) == 10.0)
    assert(TrimmedStats.percentile(xs, 100) == 40.0)
    // k = .5*3 = 1.5 → 20*(2-1.5) + 30*(1.5-1) = 25
    assert(TrimmedStats.percentile(xs, 50) == 25.0)
    for (_ <- 1 to 200) {
      val v = randVec(100)
      val p = rnd.nextDouble() * 100
      if (v.nonEmpty) {
        val got = TrimmedStats.percentile(v.sorted, p)
        assert(got >= v.min - 1e-9 && got <= v.max + 1e-9)
      }
    }
  }

  test("Aggregator matches single-node TrimmedStats over a grouped DataFrame") {
    val rows = (1 to 997).map(i => (s"g${i % 3}", rnd.nextDouble() * 1000))
    val df = rows.toDF("g", "v").repartition(4) // force multi-partition merge path
    val got = df.groupBy("g")
      .agg(TrimmedAggs.trimmed_mean(col("v"), 1.0).as("tm"),
        TrimmedAggs.trimmed_percentile(col("v"), 90.0, 1.0).as("tp"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val arr = vs.map(_._2).toArray
      assert(math.abs(got(g)._1 - TrimmedStats.trimmedMean(arr, 1.0)) < 1e-9, s"mean $g")
      assert(math.abs(got(g)._2 - TrimmedStats.trimmedPercentile(arr, 90.0, 1.0)) < 1e-9, s"pct $g")
    }
  }
}
