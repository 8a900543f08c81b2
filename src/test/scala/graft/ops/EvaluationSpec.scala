package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Specs for the evaluation/time-series surface (q159–q162 families). */
class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("aucOf: tie-corrected Mann–Whitney AUC on a hand case") {
    // pos scores {3, 2}, neg {2, 1}: concordant pairs 3>1, 3>2, 2>1,
    // tie (2,2) counts 1/2 -> U = 3.5, AUC = 3.5/4 = 0.875
    val df = Seq((3L, 1L), (2L, 1L), (2L, 0L), (1L, 0L))
      .toDF("score_fx", "pos")
    val r = Evaluation.aucOf(df).collect().head
    assert(r.getLong(r.fieldIndex("n_pos")) == 2L)
    assert(r.getLong(r.fieldIndex("n_neg")) == 2L)
    assert(r.getLong(r.fieldIndex("auc_fx")) == 875000L)
  }

  test("aucOf: perfect separation gives 1.0, reversed gives 0.0") {
    val perfect = Seq((10L, 1L), (9L, 1L), (2L, 0L), (1L, 0L))
      .toDF("score_fx", "pos")
    assert(Evaluation.aucOf(perfect).collect().head
      .getAs[Long]("auc_fx") == 1000000L)
    val reversed = perfect.withColumn("pos", lit(1L) - col("pos"))
    assert(Evaluation.aucOf(reversed).collect().head
      .getAs[Long]("auc_fx") == 0L)
  }

  test("calibrationOf: exact integer binning, rates, relative means") {
    // lo=0, hi=9: bin = s*10 div 10 = s; two rows per occupied bin
    val df = Seq((0L, 0L), (0L, 1L), (9L, 0L), (9L, 1L))
      .toDF("score_fx", "pos")
    val got = Evaluation.calibrationOf(df).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("pos_rate_fx"),
          r.getAs[Long]("avg_rel_fx"))).toMap
    assert(got == Map(0L -> ((2L, 500000L, 0L)), 9L -> ((2L, 500000L, 9L))))
  }

  test("ewmaOf: exact rational weights, gap-insensitive over observed days") {
    // cnts 1,2,4 newest-last: wsum = 4*16384 + 2*12288 + 1*9216 = 99328
    // ewma = 99328/65536 = 1.515625 exactly
    val ud = Seq(("u", 1L, 1L), ("u", 2L, 2L), ("u", 3L, 4L),
      ("v", 10L, 1L), ("v", 20L, 2L), ("v", 30L, 4L))
      .toDF("user_id", "day", "cnt")
    val got = Temporal.ewmaOf(ud).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("u") == ((3L, 1515625L)))
    assert(got("v") == ((30L, 1515625L))) // same cnt sequence, wider gaps
  }

  test("ewmaOf: truncation keeps only the 8 most recent observed days") {
    // 9 days of huge early counts then zeros: day-1's count must not leak
    val ud = (1L to 9L).map(d => ("u", d, if (d == 1L) 1000000L else 0L))
      .toDF("user_id", "day", "cnt")
    val r = Temporal.ewmaOf(ud).collect().head
    assert(r.getLong(1) == 9L && r.getLong(2) == 0L)
  }

  test("seasonalOf: constant series decomposes to trend=value, zero seasonal/residual") {
    val daily = (0L until 21L).map(d => (d, 700L)).toDF("day", "rev_fx")
    val got = Temporal.seasonalOf(daily).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    assert(got.size == 21)
    // full-window interior days: trend 700, residual 0
    (3L until 18L).foreach { d =>
      assert(got(d) == ((Some(700L), 0L, Some(0L))))
    }
    // edge days lack the full 7-day window -> null trend and residual
    Seq(0L, 1L, 2L, 18L, 19L, 20L).foreach { d =>
      assert(got(d)._1.isEmpty && got(d)._3.isEmpty)
    }
  }

  test("bestOfK clamps k to n: a 2-doc source reports best-of-2 instead of vanishing") {
    import spark.implicits._
    // passText clears all four q187 rules (30 words, 2 stopwords,
    // avg word length ~5.7, all distinct); failText fails r1 (nw<30)
    val passText = ((1 to 28).map(i => f"word$i%02d") ++ Seq("the", "a")).mkString(" ")
    val failText = "too short"
    val d = (Seq(("tiny", failText), ("tiny", failText)) ++
      (1 to 3).map(_ => ("big", passText)) ++
      (1 to 3).map(_ => ("big", failText))).toDF("source", "text")
    val got = Evaluation.bestOfK(d, 5)
      .select("source", "k", "n_samples", "n_pass", "pass_at_k_fx")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // tiny: n=2 < 5 → k clamped to 2; both fail → pass@2 = 0
    assert(got("tiny") == (("tiny", 2L, 2L, 0L, 0L)))
    // big: n=6, k=5, c=3 → a zero factor (n−c=3 < 5) → pass@5 = 1 exactly
    assert(got("big") == (("big", 5L, 6L, 3L, 1000000L)))
    // and the k=5 slice of passAtKOf (the pre-fix summary source)
    // really does drop the tiny source — the gap bestOfK closes
    assert(Evaluation.passAtKOf(d).filter(col("k") === 5)
      .filter(col("source") === "tiny").count() == 0L)
  }
}
