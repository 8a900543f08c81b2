package graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge
import graft.functions.{DotProduct, HammingDistance, HmacSha256, TextFunctions}
import graft.ops.TextAnalysis

/** SparkSessionExtensions registration making the engine's function
  * surface first-class in SQL — custom Catalyst expressions AND the
  * composite text-pipeline functions:
  *
  *   SELECT dot_product(a.emb, b.emb), hamming(h1, h2),
  *          hmac_sha256(payload, key),
  *          token_count(text), lang_id(text), quality_score(text),
  *          redact(line), dup3_frac(text), top_tok_frac(text) ...
  *
  * Composite functions expand at registration into the same codegen'd
  * built-in expression trees as their Column forms (no UDFs), so SQL
  * and DataFrame users get byte-identical semantics and plans.
  *
  * Wire with `.withExtensions(new GraftExtensions)` (GraftSession does
  * this) or `spark.sql.extensions=graft.GraftExtensions` on a cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(e: SparkSessionExtensions, name: String, clazz: String,
      arity: Int)(build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(clazz, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity argument(s)")
        build(args)
      }))

  private def injectColumnFn(e: SparkSessionExtensions, name: String, arity: Int)(
      build: Seq[Column] => Column): Unit =
    inject(e, name, classOf[TextFunctions.type].getName, arity)(args =>
      ColumnBridge.expressionEager(build(args.map(ColumnBridge.column))))

  override def apply(e: SparkSessionExtensions): Unit = {
    inject(e, "dot_product", classOf[DotProduct].getName, 2)(a => DotProduct(a(0), a(1)))
    inject(e, "hamming", classOf[HammingDistance].getName, 2)(a => HammingDistance(a(0), a(1)))
    inject(e, "hmac_sha256", classOf[HmacSha256].getName, 2)(a => HmacSha256(a(0), a(1)))

    injectColumnFn(e, "token_count", 1)(c => TextFunctions.tokenCount(c.head))
    injectColumnFn(e, "bpe_token_count", 1)(c => TextFunctions.bpeTokenCount(c.head))
    injectColumnFn(e, "lang_id", 1)(c => TextFunctions.langId(c.head))
    injectColumnFn(e, "quality_score", 1)(c => TextFunctions.qualityScore(c.head))
    injectColumnFn(e, "stopword_count", 1)(c => TextFunctions.stopwordCount(c.head))
    injectColumnFn(e, "punct_count", 1)(c => TextFunctions.punctCount(c.head))
    injectColumnFn(e, "redact", 1)(c => TextFunctions.redact(c.head))
    injectColumnFn(e, "doc_fingerprint", 1)(c => TextFunctions.fingerprint(c.head))
    injectColumnFn(e, "dup3_frac", 1)(c => TextAnalysis.dup3Frac(c.head))
    injectColumnFn(e, "top_tok_frac", 1)(c => TextAnalysis.topTokFrac(c.head))
  }
}
