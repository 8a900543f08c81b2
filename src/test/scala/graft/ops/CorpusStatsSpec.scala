package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed contracts for the round-11 corpus-statistics
  * operators (q194–q200). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side twin of the q66 'v1|' split stamp. */
  private def isTrain(id: Long): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"v1|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    hex.substring(0, 4) < "cccc"
  }

  test("valCrossEntropyOf: hand-built LM, OOV bucket, exact fixed-point path") {
    // assign texts BY the split each id actually lands in, so the LM
    // and the val slice are fully known: train docs say "a a b",
    // val docs say "a z" (z is OOV)
    val ids = (0L until 40L)
    val train = ids.filter(isTrain)
    val vals = ids.filterNot(isTrain)
    assert(train.nonEmpty && vals.nonEmpty)
    val d = (train.map(i => (i, "s", "a a b")) ++ vals.map(i => (i, "s", "a z")))
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.valCrossEntropyOf(d)
      .as[(String, Long, Long, Long)].collect().toList
    // LM: c(a)=2T, c(b)=T over N=3T tokens, V=2 → p(t)=(c+1)/(N+3)
    val t = train.size.toLong; val v = vals.size.toLong
    val n = 3 * t
    def nl(c: Long): Long = math.round(math.log((n + 3).toDouble / (c + 1)) * 1e9)
    // val tokens per doc: one 'a' (count 2T), one OOV 'z' (count 0);
    // xent_fx is the exact truncating integer division of the 1e-9
    // fixed-point sum by the val token count (round-12 ADVICE: no
    // round(double) output on the gate)
    val hfx = v * (nl(2 * t) + nl(0))
    val expected = hfx / (2 * v)
    assert(got == List(("s", 2 * v, v, expected)))
  }

  test("bigramNoveltyOf: first-appearance attribution by min doc_id") {
    val d = Seq(
      (1L, "x", "a b c"),   // grams "a b","b c" — both first here
      (2L, "y", "a b d"))   // "a b" first seen in doc 1, "b d" new
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.bigramNoveltyOf(d)
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(("x", 2L, 2L, 1000000L), ("y", 2L, 1L, 500000L)))
  }

  test("lengthKsOf: exact ECDF distance; identical distributions give 0") {
    val d = Seq(
      ("p", "w"), ("p", "w w"),   // lengths 1, 2
      ("q", "w w"),               // length 2
      ("r", "w"), ("r", "w w"))   // = p's distribution
      .toDF("source", "text")
    val ks = CorpusStats.lengthKsOf(d, "p", "q")
      .as[(Long, Long, Long)].head()
    assert(ks == ((2L, 1L, 500000L)))
    val zero = CorpusStats.lengthKsOf(d, "p", "r")
      .as[(Long, Long, Long)].head()
    assert(zero == ((2L, 2L, 0L)))
    // source vanished in the refresh: an empty side reports maximal
    // drift (sentinel 1e6), not a divide-by-zero (round-12 ADVICE)
    val gone = CorpusStats.lengthKsOf(d, "p", "absent")
      .as[(Long, Long, Long)].head()
    assert(gone == ((2L, 0L, 1000000L)))
  }

  test("stratifiedSampleOf: largest-remainder quotas hit the total exactly") {
    // strata 6/3/1, total 5 → bases 3/1/0, remainders 0/5/5 → the one
    // leftover seat goes to 'b' (tie with 'c' breaks on stratum asc)
    val d = ((1 to 6).map(i => (i.toLong, "a")) ++
      (7 to 9).map(i => (i.toLong, "b")) ++ Seq((10L, "c")))
      .toDF("doc_id", "lang")
    val got = CorpusStats.stratifiedSampleOf(d, "doc_id", "lang", 5L, "s")
    val perStratum = got.groupBy(col("lang")).count()
      .as[(String, Long)].collect().toMap
    assert(perStratum == Map("a" -> 3L, "b" -> 2L))
    assert(got.count() == 5L)
    // stable under repartition (hash-rank picks, not partition order)
    val again = CorpusStats.stratifiedSampleOf(d.repartition(7), "doc_id", "lang", 5L, "s")
    assert(got.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
    // total beyond the corpus degrades to the whole corpus
    assert(CorpusStats.stratifiedSampleOf(d, "doc_id", "lang", 99L, "s").count() == 10L)
  }

  test("labelCentroidSimOf: orthogonal centroids 0, parallel 1e6") {
    val e = Seq(
      (0, Array(1.0f, 0.0f)), (0, Array(1.0f, 0.0f)),
      (1, Array(0.0f, 1.0f)),
      (2, Array(2.0f, 0.0f)))
      .toDF("label", "embedding")
    val got = CorpusStats.labelCentroidSimOf(e, "label", "embedding")
      .as[(Int, Int, Long, Long, Long)].collect().toList
    assert(got == List(
      (0, 1, 2L, 1L, 0L),        // orthogonal
      (0, 2, 2L, 1L, 1000000L),  // parallel
      (1, 2, 1L, 1L, 0L)))
  }

  test("repetitionRunsOf: gaps-and-islands run lengths on hand docs") {
    val d = Seq(
      (1L, "s", "a a a b b c"),  // runs 3,2,1 → max 3, run_tokens 3
      (2L, "s", "x y"),          // no repeats
      (3L, "t", "z z z z"))      // one run of 4
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.repetitionRunsOf(d)
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(got == List(("s", 2L, 3L, 1L, 3L), ("t", 1L, 4L, 1L, 4L)))
  }

  test("scale contracts: KS and centroids invariant under replication, runs scale linearly") {
    // the behaviors that must hold when the corpus grows m×:
    // duplicating every doc of both sources leaves each ECDF — and so
    // the KS distance — unchanged (counts scale, shares don't)
    val d = Seq(("p", "w"), ("p", "w w"), ("q", "w w"), ("q", "w w w"))
      .toDF("source", "text")
    val dm = d.union(d).union(d)
    val ks1 = CorpusStats.lengthKsOf(d, "p", "q").select("ks_fx").as[Long].head()
    val ks3 = CorpusStats.lengthKsOf(dm, "p", "q").select("ks_fx").as[Long].head()
    assert(ks1 == ks3 && ks1 > 0)
    // replicating every vector of a label moves its centroid nowhere
    val e = Seq((0, Array(1.0f, 0.2f)), (0, Array(0.8f, 0.4f)),
      (1, Array(0.1f, 0.9f))).toDF("label", "embedding")
    val c1 = CorpusStats.labelCentroidSimOf(e, "label", "embedding")
      .select("cos_fx").as[Long].head()
    val c4 = CorpusStats.labelCentroidSimOf(e.union(e).union(e).union(e),
      "label", "embedding").select("cos_fx").as[Long].head()
    assert(c1 == c4)
    // repetition runs are per-doc: m× distinct-id copies scale the doc
    // counts m× and leave the run spectrum (max_run) unchanged
    val r = Seq((1L, "s", "a a a b"), (2L, "s", "x y")).toDF("doc_id", "source", "text")
    val rm = (0 until 3).map(i => r.withColumn("doc_id", col("doc_id") + lit(i * 100L)))
      .reduce(_ union _)
    val s1 = CorpusStats.repetitionRunsOf(r)
      .as[(String, Long, Long, Long, Long)].head()
    val s3 = CorpusStats.repetitionRunsOf(rm)
      .as[(String, Long, Long, Long, Long)].head()
    assert(s1 == (("s", 2L, 3L, 1L, 3L)))
    assert(s3 == (("s", 6L, 3L, 3L, 9L)))
  }

  test("releaseGateOf: hand-computed checklist, both verdict branches exercised") {
    val passText = ((1 to 28).map(i => f"word$i%02d") ++ Seq("the", "a")).mkString(" ")
    val d = (Seq(
      (0L, "s", ""),               // empty
      (1L, "s", "z z z w"),        // stutter run 3, quality fail
      (2L, "s", passText),         // quality pass, dup pair with 3
      (3L, "s", passText)) ++
      (4L to 39L).map(i => (i, "s", s"short text v$i")))
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.releaseGateOf(d)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // empty: 1/40; dup: (40-39)/40; quality: 2/40; stutter: 1/39
    // docs with >=1 token
    assert(got("empty_doc_share") == ((25000L, 10000L, false)))
    assert(got("exact_dup_share") == ((25000L, 50000L, true)))
    // near-dup (round-13): docs 2/3 are byte-identical → J = 1.0, doc
    // 3 is the later duplicate; "short text vN" docs share only 1 of
    // their 3-bigram union (J = 1/3 < 0.5) → exactly 1 masked of 40
    assert(got("near_dup_share") == ((25000L, 100000L, true)))
    assert(got("quality_pass_share") == ((50000L, 500000L, false)))
    assert(got("stutter_doc_share") == ((1000000L / 39L, 50000L, true)))
    // oov computed independently from the same split stamp
    val rows = (Seq((0L, ""), (1L, "z z z w"), (2L, passText), (3L, passText)) ++
      (4L to 39L).map(i => (i, s"short text v$i")))
    def toks(t: String) = t.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val trainVocab = rows.filter(r => isTrain(r._1)).flatMap(r => toks(r._2)).toSet
    val valToks = rows.filterNot(r => isTrain(r._1)).flatMap(r => toks(r._2))
    val expOov = valToks.count(!trainVocab.contains(_)).toLong * 1000000L / valToks.size
    assert(got("val_oov_share") == ((expOov, 200000L, expOov <= 200000L)))
  }

  test("valOovTrendOf: hand-computed prefixes; final row equals the gate's val_oov_share") {
    // two crawl-order cohorts over 8 docs: cohort 0 = ids 0-3,
    // cohort 1 = ids 4-7; texts assigned BY split membership so both
    // prefixes are fully hand-computable
    val ids = 0L until 8L
    val d = ids.map { i =>
      val t = if (isTrain(i)) "a b" else if (i < 4) "a q" else "q r"
      (i, "s", t)
    }.toDF("doc_id", "source", "text")
    val got = CorpusStats.valOovTrendOf(d, nCohorts = 2)
      .as[(Long, Long)].collect().toList
    // driver-side twin of the cumulative-prefix OOV computation
    def oovAt(upto: Long): Long = {
      val in = ids.filter(i => i / 4 <= upto)
      val vocab = in.filter(isTrain).flatMap(i => Seq("a", "b")).toSet
      val valToks = in.filterNot(isTrain)
        .flatMap(i => if (i < 4) Seq("a", "q") else Seq("q", "r"))
      if (valToks.isEmpty) 1000000L
      else valToks.count(!vocab.contains(_)).toLong * 1000000L / valToks.size
    }
    assert(got == List((0L, oovAt(0)), (1L, oovAt(1))))
    // the trend's last row IS the release gate's val_oov_share
    val gate = CorpusStats.releaseGateOf(d)
      .filter(col("chk") === "val_oov_share")
      .select(col("value_fx")).as[Long].head()
    assert(got.last._2 == gate, "trend tail must equal the gate's val_oov_share")
  }

  test("cohortRetentionOf: first-event day cohorts, distinct user-days") {
    def nanos(day: Int, hour: Int): Long =
      (java.time.LocalDate.of(2024, 1, 1).plusDays(day)
        .atTime(hour, 0).toEpochSecond(java.time.ZoneOffset.UTC)) * 1000000000L
    val ev = Seq(
      (1L, nanos(0, 1)), (1L, nanos(0, 9)), (1L, nanos(1, 2)),  // two day-0 events collapse
      (2L, nanos(1, 5)))
      .toDF("user_id", "ts")
    val got = CorpusStats.cohortRetentionOf(ev)
      .select(col("cohort_day").cast("string"), col("day_k"), col("n_users"))
      .as[(String, Int, Long)].collect().toList
    assert(got == List(
      ("2024-01-01", 0, 1L), ("2024-01-01", 1, 1L), ("2024-01-02", 0, 1L)))
  }
}
