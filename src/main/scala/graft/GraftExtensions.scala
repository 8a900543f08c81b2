package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, HammingDistance}

/** SparkSessionExtensions registration for the engine's custom
  * Catalyst expressions, making them first-class SQL functions:
  *
  *   SELECT dot_product(a.embedding, b.embedding), hamming(h1, h2) ...
  *
  * Wire with `.withExtensions(new GraftExtensions)` (GraftSession does
  * this) or `spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product(arrayA, arrayB)")
        DotProduct(args(0), args(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "hamming"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hamming(strA, strB)")
        HammingDistance(args(0), args(1))
      }))
  }
}
