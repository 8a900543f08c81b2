package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd "any probe in sorted set" over array<long> columns — the
  * map-side membership prefilter for stream-legal decontamination
  * (round-16, guide §1.2 step 2 / §3.2 spirit).
  *
  * The streaming decontamination test previously ran
  * `array_intersect(doc_grams, bench_grams)` per row: Spark's
  * ArrayIntersect rebuilds a hash set over one argument on EVERY
  * evaluation, so each corpus row re-hashed the entire (vocabulary-
  * sized) benchmark gram set — O(|bench|) string hashes per row, the
  * dominant cost of the whole streaming recipe gate. This expression
  * instead binary-searches each doc-gram HASH against the benchmark's
  * hash array (sorted once, upstream, inside the broadcast row):
  * O(|doc grams| · log |bench|) long comparisons per row, no per-row
  * set build, no string hashing of the bench side.
  *
  * `left` MUST be sorted ascending (the caller builds it with
  * sort_array) and neither array may contain null elements — both
  * hold by construction for sort_array(collect_set(xxhash64(...)))
  * and transform(..., xxhash64) inputs. A hash MATCH is only a
  * candidate (collisions possible): callers confirm matches with the
  * exact string test, so false positives cost work, never
  * correctness; a miss is definitive (a true string match implies a
  * hash match).
  */
case class SortedLongContainsAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sorted_contains_any needs array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val s = a.asInstanceOf[ArrayData]
    val xs = b.asInstanceOf[ArrayData]
    val n = s.numElements()
    var i = 0
    while (i < xs.numElements()) {
      val x = xs.getLong(i)
      var lo = 0
      var hi = n - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val v = s.getLong(mid)
        if (v == x) return true
        else if (v < x) lo = mid + 1
        else hi = mid - 1
      }
      i += 1
    }
    false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi"); val mid = ctx.freshName("mid")
      val v = ctx.freshName("v"); val found = ctx.freshName("found")
      s"""
         |boolean $found = false;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $b.numElements() && !$found; $i++) {
         |  long $x = $b.getLong($i);
         |  int $lo = 0, $hi = $n - 1;
         |  while ($lo <= $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    long $v = $a.getLong($mid);
         |    if ($v == $x) { $found = true; break; }
         |    else if ($v < $x) { $lo = $mid + 1; } else { $hi = $mid - 1; }
         |  }
         |}
         |${ev.value} = $found;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongContainsAny =
    copy(left = l, right = r)
}

object SetExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form: true iff any element of `probes` occurs in the
    * ascending-sorted `sorted` array (both array<long>, no nulls). */
  def sortedContainsAny(sorted: Column, probes: Column): Column =
    ColumnBridge.column(SortedLongContainsAny(
      ColumnBridge.expression(sorted), ColumnBridge.expression(probes)))
}
