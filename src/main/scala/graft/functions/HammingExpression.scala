package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Hamming distance between two strings (count of differing
  * positions; a length difference counts one per extra char, so equal-
  * length inputs — our simhash bit strings — match DuckDB's
  * `hamming()` exactly).
  *
  * Exists for the SimHash near-dup join: the pair filter runs over
  * millions of banded candidates, so it must stay inside
  * WholeStageCodegen rather than falling back to an interpreted UDF.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming needs string inputs, got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].getBytes
    val y = b.asInstanceOf[UTF8String].getBytes
    val n = math.min(x.length, y.length)
    var d = math.abs(x.length - y.length)
    var i = 0
    while (i < n) { if (x(i) != y(i)) d += 1; i += 1 }
    d
  }

  // Locals come from ctx.freshName so two HammingDistance instances (or a
  // mix with other graft expressions) in one codegen'd stage can't collide
  // on declarations and silently knock the stage back to interpreted mode.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xb = ctx.freshName("xb"); val yb = ctx.freshName("yb")
      val n = ctx.freshName("n"); val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      s"""
         |byte[] $xb = $a.getBytes();
         |byte[] $yb = $b.getBytes();
         |int $n = Math.min($xb.length, $yb.length);
         |int $d = Math.abs($xb.length - $yb.length);
         |for (int $i = 0; $i < $n; $i++) { if ($xb[$i] != $yb[$i]) $d++; }
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDistance =
    copy(left = l, right = r)
}

object HammingExpression {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def hamming(a: Column, b: Column): Column =
    ColumnBridge.column(
      HammingDistance(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
