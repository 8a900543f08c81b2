package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._

/** Deterministic Bloom filter over pre-hashed (xxhash64) keys — the
  * runtime-filter / standing-index primitive: build once over a key
  * set (one aggregation, O(bits) state), broadcast the bit array,
  * and test membership map-side with a codegen'd expression. k bit
  * positions derive from one 64-bit hash by double hashing
  * (Kirsch–Mitzenmacher 2006: g_i = h1 + i·h2), so build and probe
  * agree by construction.
  *
  * False positives are possible (classic Bloom bound ≈ (1−e^{−kn/m})^k);
  * false negatives are not — callers that need exactness re-verify
  * the survivors with the real join (see `BloomIndex.bloomSemiJoin`),
  * which touches only the prefiltered fraction.
  */
object BloomFunctions {

  /** Second hash for double hashing — splitmix64-style finalizer so
    * h2 is well-mixed and odd-ish; shared verbatim by the aggregator
    * (Scala) and the membership expression (Java codegen). */
  private[functions] val Mix = 0x9E3779B97F4A7C15L

  private[functions] def h2(h: Long): Long = (h ^ (h >>> 33)) * Mix

  private[functions] def position(h: Long, i: Int, numBits: Int): Int =
    (((h + i.toLong * h2(h)) & Long.MaxValue) % numBits).toInt

  /** Bloom build aggregator: input = xxhash64 of the key, buffer =
    * the bit words. Merge is word-wise OR — fully commutative, so the
    * result is a pure function of the key SET (partition order never
    * matters). */
  private def bloomAgg(numBits: Int, k: Int): Aggregator[Long, Array[Long], Array[Long]] =
    new Aggregator[Long, Array[Long], Array[Long]] {
      def zero: Array[Long] = new Array[Long]((numBits + 63) / 64)
      def reduce(b: Array[Long], h: Long): Array[Long] = {
        var i = 0
        while (i < k) {
          val p = position(h, i, numBits)
          b(p >>> 6) |= (1L << (p & 63))
          i += 1
        }
        b
      }
      def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }
      def finish(b: Array[Long]): Array[Long] = b
      def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
      def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelper.longArray
    }

  /** `bloom_build(xxhash64(key), numBits, k)` → array<bigint> bit words. */
  def bloom_build(hashCol: Column, numBits: Int, k: Int): Column =
    udaf(bloomAgg(numBits, k), Encoders.scalaLong).apply(hashCol)

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** `bloom_might_contain(bits, xxhash64(key))` → boolean; codegen'd
    * k-probe loop, no false negatives. */
  def bloom_might_contain(bits: Column, hashCol: Column, numBits: Int, k: Int): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(bits), ColumnBridge.expression(hashCol), numBits, k))
}

private[functions] object ExpressionEncoderHelper {
  // A real array<bigint> encoder (kryo would surface as BinaryType and
  // break the membership expression's input contract).
  val longArray: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Membership probe: left = bit words (array<bigint>), right = the
  * xxhash64 key hash. Compiles to a tight k-iteration loop inside
  * WholeStageCodegen — the probe side of a 100 TB scan pays k word
  * reads per row and nothing else. */
case class BloomMightContain(left: Expression, right: Expression,
    numBits: Int, k: Int) extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs (array<bigint>, bigint), got $l / $r")
    }

  override def nullSafeEval(bitsAny: Any, hAny: Any): Any = {
    val bits = bitsAny.asInstanceOf[ArrayData]
    val h = hAny.asInstanceOf[Long]
    var i = 0
    var all = true
    while (all && i < k) {
      val p = BloomFunctions.position(h, i, numBits)
      all = ((bits.getLong(p >>> 6) >>> (p & 63)) & 1L) == 1L
      i += 1
    }
    all
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bits, h) => {
      val g = ctx.freshName("g"); val i = ctx.freshName("i")
      val p = ctx.freshName("p"); val all = ctx.freshName("all")
      s"""
         |long $g = (($h) ^ (($h) >>> 33)) * ${BloomFunctions.Mix}L;
         |boolean $all = true;
         |for (int $i = 0; $all && $i < $k; $i++) {
         |  long $p = ((($h) + (long) $i * $g) & Long.MAX_VALUE) % ${numBits}L;
         |  $all = (($bits.getLong((int) ($p >>> 6)) >>> (int) ($p & 63L)) & 1L) == 1L;
         |}
         |${ev.value} = $all;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}
