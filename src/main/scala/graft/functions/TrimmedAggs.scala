package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Exact order statistics shared by the trimmed aggregators.
  *
  * Semantics are an exact mirror of the reference bench statistics
  * (reference bench/e2e_bench/e2e_bench.go:260-305, duplicated at
  * bench/http_load/http_load.go:180-209):
  *   - trim count = truncate(n * pct / 100); if trim*2 >= n, trim = n/2
  *   - percentile = linear interpolation at k = (p/100)*(n-1)
  *   - empty input → 0
  *
  * The sort-then-sum order matches the Go code (ascending), so results
  * are bit-identical to a single-node run of the reference.
  */
object TrimmedStats {
  def trim(sorted: Array[Double], trimPct: Double): Array[Double] = {
    val n = sorted.length
    var t = (n.toDouble * trimPct / 100.0).toInt
    if (t * 2 >= n) t = n / 2
    sorted.slice(t, n - t)
  }

  def mean(data: Array[Double]): Double = {
    if (data.isEmpty) return 0.0
    var sum = 0.0
    var i = 0
    while (i < data.length) { sum += data(i); i += 1 }
    sum / data.length
  }

  def percentile(sorted: Array[Double], p: Double): Double = {
    if (sorted.isEmpty) return 0.0
    val k = (p / 100.0) * (sorted.length - 1)
    val f = k.toInt
    val c = f + 1
    if (c >= sorted.length) sorted(sorted.length - 1)
    else sorted(f) * (c - k) + sorted(c) * (k - f)
  }

  def trimmedMean(data: Array[Double], trimPct: Double): Double = {
    if (data.isEmpty) return 0.0
    val s = data.sorted
    mean(trim(s, trimPct))
  }

  def trimmedPercentile(data: Array[Double], p: Double, trimPct: Double): Double = {
    if (data.isEmpty) return 0.0
    val s = data.sorted
    percentile(trim(s, trimPct), p)
  }
}

/** Base for exact collect-sort aggregators (A2–A4).
  *
  * Buffer holds all group values — exact by construction, which is what
  * the oracle gate requires. At 100 TB this is only safe when group
  * cardinality is bounded (latency vectors per bench run, per-key
  * percentiles); for unbounded groups the engine's scale path is
  * `percentile_approx` (documented in ops.Aggregates).
  */
abstract class CollectSortAgg extends Aggregator[Double, ArrayBuffer[Double], Double] {
  def finishSorted(sorted: Array[Double]): Double
  final def zero: ArrayBuffer[Double] = ArrayBuffer.empty[Double]
  final def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = { b += a; b }
  final def merge(b1: ArrayBuffer[Double], b2: ArrayBuffer[Double]): ArrayBuffer[Double] = { b1 ++= b2; b1 }
  final def finish(b: ArrayBuffer[Double]): Double = {
    if (b.isEmpty) 0.0
    else {
      val arr = b.toArray
      java.util.Arrays.sort(arr)
      finishSorted(arr)
    }
  }
  final def bufferEncoder: Encoder[ArrayBuffer[Double]] = Encoders.kryo[ArrayBuffer[Double]]
  final def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** A3 — trimmed mean (reference e2e_bench.go:260-275). */
class TrimmedMean(trimPct: Double) extends CollectSortAgg {
  def finishSorted(sorted: Array[Double]): Double =
    TrimmedStats.mean(TrimmedStats.trim(sorted, trimPct))
}

/** A4 — trimmed percentile (reference e2e_bench.go:278-289). */
class TrimmedPercentile(p: Double, trimPct: Double) extends CollectSortAgg {
  def finishSorted(sorted: Array[Double]): Double =
    TrimmedStats.percentile(TrimmedStats.trim(sorted, trimPct), p)
}

object TrimmedAggs {
  /** Column form: `trimmed_mean(col, 1.0)`. */
  def trimmed_mean(c: Column, trimPct: Double): Column =
    udaf(new TrimmedMean(trimPct)).apply(c)

  def trimmed_percentile(c: Column, p: Double, trimPct: Double): Column =
    udaf(new TrimmedPercentile(p, trimPct)).apply(c)
}
