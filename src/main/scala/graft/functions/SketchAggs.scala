package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.immutable.TreeSet

/** KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002):
  * hash every value to a uniform integer in [0, 2^32), keep the k
  * smallest DISTINCT hashes; with h_k the k-th smallest as a fraction
  * of the hash space, distinct ≈ (k−1)/h_k. Unlike HLL/approx_
  * count_distinct — whose register layouts differ per engine and can
  * never hash-match an oracle — KMV over an md5-derived hash is a
  * pure deterministic function of the value SET: partition order,
  * merge order, and engine all cancel out, so the sketch itself is
  * DuckDB-certifiable (q81).
  *
  * This Aggregator is the scale form: O(k) state per group
  * (a capped TreeSet — dedup and order in one structure), map-side
  * partial merge, no per-group window. `Aggregates.kmvDistinct`
  * builds the window form whose plan the oracle mirrors; the spec
  * pins both forms equal.
  */
object SketchAggs {

  /** Merge-capped bottom-k distinct set. TreeSet gives dedup +
    * ordered access; dropping above k bounds state at O(k). */
  final case class KmvBuf(k: Int, mins: TreeSet[Double]) {
    def add(h: Double): KmvBuf =
      if (mins.contains(h)) this
      else {
        val m = mins + h
        copy(mins = if (m.size > k) m.take(k) else m)
      }
    def merge(o: KmvBuf): KmvBuf = {
      val m = mins ++ o.mins
      copy(mins = if (m.size > k) m.take(k) else m)
    }
    /** (k−1)/h_k scaled to the 2^32 hash space; exact count when the
      * group has fewer than k distinct hashes. */
    def estimate: Double =
      if (mins.size < k) mins.size.toDouble
      else (k - 1).toDouble * 4294967296.0 / mins.last
  }

  private def kmvAgg(k: Int): Aggregator[Double, KmvBuf, Double] =
    new Aggregator[Double, KmvBuf, Double] {
      def zero: KmvBuf = KmvBuf(k, TreeSet.empty[Double])
      def reduce(b: KmvBuf, h: Double): KmvBuf = b.add(h)
      def merge(a: KmvBuf, b: KmvBuf): KmvBuf = a.merge(b)
      def finish(b: KmvBuf): Double = b.estimate
      def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** `kmv_distinct(hashCol, k)` — hashCol must already be the uniform
    * [0, 2^32) hash (see `Aggregates.kmvHash` for the md5-prefix
    * construction shared with the oracle). */
  def kmv_distinct(col: Column, k: Int): Column =
    udaf(kmvAgg(k), Encoders.scalaDouble).apply(col)
}
