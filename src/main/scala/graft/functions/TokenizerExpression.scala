package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match tokenization against a FIXED vocabulary — the
  * inference-time shape of every BPE/WordPiece tokenizer (the trained
  * merge table is a standing artifact; encoding is a pure map-side
  * function of it). At each position the longest vocab entry matching
  * the text wins; no entry ⇒ a 1-char fallback (byte-fallback
  * analogue). The expression emits the comma-joined TOKEN LENGTHS
  * ("3,5,1,…") — a complete certificate of the greedy path (token
  * count = element count, and the boundary sequence reconstructs the
  * segmentation), which the q113 oracle mirrors with a recursive CTE.
  *
  * Vocab entries are bucketed by length into per-length hash sets, so
  * a position costs at most maxTokenLen probes — the structure rides
  * into generated code as a reference object, one compiled-helper
  * call per row inside WholeStageCodegen (no per-row vocab scan, no
  * interpreted lambda).
  */
case class GreedyTokenLens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"greedy_token_lens needs a string input, got ${child.dataType}")

  @transient private lazy val byLen: Array[java.util.HashSet[String]] =
    GreedyTokenLens.bucketize(vocab)

  override def nullSafeEval(input: Any): Any =
    GreedyTokenLens.compute(input.asInstanceOf[UTF8String], byLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabByLen", byLen, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GreedyTokenLens.compute($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): GreedyTokenLens =
    copy(child = c)
}

object GreedyTokenLens {

  private[functions] def bucketize(vocab: Seq[String]): Array[java.util.HashSet[String]] = {
    val maxL = vocab.map(_.length).max
    val arr = new Array[java.util.HashSet[String]](maxL + 1)
    vocab.foreach { t =>
      if (arr(t.length) == null) arr(t.length) = new java.util.HashSet[String]()
      arr(t.length).add(t)
    }
    arr
  }

  /** Called from generated code — keep the signature stable. */
  def compute(s: UTF8String, byLen: Array[java.util.HashSet[String]]): UTF8String = {
    val str = s.toString
    val n = str.length
    val maxL = byLen.length - 1
    val sb = new java.lang.StringBuilder
    var pos = 0
    while (pos < n) {
      var l = math.min(maxL, n - pos)
      var step = 1
      var matched = false
      while (!matched && l >= 1) {
        val set = byLen(l)
        if (set != null && set.contains(str.substring(pos, pos + l))) {
          step = l; matched = true
        }
        l -= 1
      }
      if (sb.length > 0) sb.append(',')
      sb.append(step)
      pos += step
    }
    UTF8String.fromString(sb.toString)
  }

  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column form: `greedy_token_lens(text)` → "3,5,1,…". */
  def greedy_token_lens(text: Column, vocab: Seq[String]): Column =
    ColumnBridge.column(GreedyTokenLens(ColumnBridge.expression(text), vocab))
}
