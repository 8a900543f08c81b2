package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

/** Bounded per-group top-k by (sortKey, id) descending — the scale
  * form of R3's "top-K per key for ALL keys".
  *
  * The window formulation (`row_number().over(partitionBy(key)
  * .orderBy(...)) <= k`) shuffles and sorts EVERY row; this Aggregator
  * partial-aggregates map-side, so only ≤k rows per key per partition
  * cross the shuffle — at 100 TB that's the difference between
  * shuffling the table and shuffling k·|keys| rows. Buffer is a
  * bounded array (k is small); merge concatenates and re-trims.
  *
  * Measured honestly: at sf0.1 on local[32] the window form is FASTER
  * (0.43 s vs 0.71 s) — kryo buffer serialization dominates when the
  * shuffle isn't the bottleneck. Pick this form when shuffle volume
  * is the constraint (wide tables, real network), the window form
  * otherwise; q04/q52 gate both against the same oracle.
  */
class TopKPairs(k: Int)
    extends Aggregator[(Long, Long), ArrayBuffer[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1)

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(b: ArrayBuffer[(Long, Long)], v: (Long, Long)): ArrayBuffer[(Long, Long)] = {
    if (b.length < k) { b += v }
    else {
      // replace the current minimum if v outranks it (k is small —
      // linear scan beats heap constant factors here)
      var minI = 0
      var i = 1
      while (i < b.length) { if (lt(b(i), b(minI))) minI = i; i += 1 }
      if (lt(b(minI), v)) b(minI) = v
    }
    b
  }

  def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty
  def reduce(b: ArrayBuffer[(Long, Long)], a: (Long, Long)): ArrayBuffer[(Long, Long)] =
    insert(b, a)
  def merge(b1: ArrayBuffer[(Long, Long)], b2: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b2.foreach(v => insert(b1, v))
    b1
  }
  def finish(b: ArrayBuffer[(Long, Long)]): Seq[(Long, Long)] =
    b.sortWith((x, y) => lt(y, x)).toSeq // descending
  def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
    Encoders.kryo[ArrayBuffer[(Long, Long)]]
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

object TopKAgg {
  /** `top_k_pairs(sortKey, id, k)`: array of (sortKey, id) structs,
    * largest first. */
  def top_k_pairs(sortKey: Column, id: Column, k: Int): Column =
    udaf(new TopKPairs(k)).apply(sortKey, id)
}
