package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-probe distillation (q102 operator): featurization contract,
  * learning (beats the majority class by a wide margin), and bit-exact
  * retrain determinism — the property the oracle gate's unrolled-CTE
  * mirror depends on. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("featurize: dense counts sum to n_tokens, bias slot carries B") {
    val df = Seq((1L, "w w z"), (2L, "  "), (3L, "q")).toDF("doc_id", "text")
    val feats = Classifier.featurize(df, "doc_id", "text")
      .select(col("doc_id"),
        size(col("c")).as("width"),
        aggregate(slice(col("c"), 1, Classifier.D), lit(0L), (a, x) => a + x)
          .as("ntok"),
        element_at(col("c"), -1).as("bc"),
        col("label"))
      .collect().map(r =>
        r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap
    assert(!feats.contains(2L), "blank docs are excluded")
    assert(feats(1L) == ((Classifier.D + 1, 3L, Classifier.B.toLong, 0)))
    assert(feats(3L) == ((Classifier.D + 1, 1L, Classifier.B.toLong, 0)))
  }

  test("trained probe beats the majority class on the corpus") {
    val feats = Classifier.featurize(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text").persist()
    try {
      val w = Classifier.train(feats)
      val pred = Classifier.predict(feats, "doc_id", w)
      val row = pred.agg(
        avg(when(col("pred") === col("label"), 1.0).otherwise(0.0)).as("acc"),
        avg(col("label").cast("double")).as("base")).collect()(0)
      val (acc, base) = (row.getDouble(0), row.getDouble(1))
      val majority = math.max(base, 1.0 - base)
      assert(acc >= 0.90, s"accuracy $acc below 0.90")
      assert(acc > majority + 0.2, s"accuracy $acc vs majority $majority")
    } finally feats.unpersist(blocking = false)
  }

  test("retraining is bit-exact (the oracle-mirror determinism contract)") {
    val feats = Classifier.featurize(
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .filter(col("doc_id") < 100),
      "doc_id", "text").persist()
    try {
      val w1 = Classifier.train(feats)
      val w2 = Classifier.train(feats)
      assert(w1 == w2)
      assert(w1.nonEmpty && w1.keySet.max == Classifier.D)
    } finally feats.unpersist(blocking = false)
  }
}
