package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.GreedyTokenLens.greedy_token_lens

/** Greedy longest-match tokenizer contracts, hand-checked. */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def lens(text: String, vocab: Seq[String]): String =
    Seq(Tuple1(text)).toDF("t")
      .select(greedy_token_lens(col("t"), vocab).as("l"))
      .as[String].head()

  test("longest match wins over a shorter prefix entry") {
    // at pos 0 both "ab" and "abc" match — greedy takes "abc"
    assert(lens("abcc", Seq("ab", "abc", "c")) == "3,1")
  }

  test("no match falls back to a single character") {
    // 'x' and 'z' are not in the vocab
    assert(lens("xabz", Seq("ab")) == "1,2,1")
  }

  test("a long entry never matches past the end of the string") {
    assert(lens("ab", Seq("abc", "a", "b")) == "1,1")
  }

  test("greedy is not optimal — locally-longest can cost tokens (documented BPE behavior)") {
    // optimal: "a"+"bcd" = 2 tokens; greedy takes "abc" then falls
    // back twice: 3 tokens. The certificate records the greedy path.
    assert(lens("abcd", Seq("abc", "bcd", "a")) == "3,1")
  }

  test("token count and total length reconstruct from the certificate") {
    val v = graft.ops.TextAnalysis.tokVocab
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), lower(trim(col("text"))).as("s"))
      .withColumn("lens", greedy_token_lens(col("s"), v))
    val bad = d.filter(
      aggregate(transform(split(col("lens"), ","), _.cast("int")),
        lit(0), (acc, x) => acc + x) =!= length(col("s")))
    assert(bad.isEmpty, "token lengths must sum to the input length")
  }
}
