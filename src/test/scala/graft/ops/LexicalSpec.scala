package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Lexical family: PMI collocations, FastSS edit-distance join, BPE
  * merge training. */
class LexicalSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- PMI

  test("pmiCollocations: hand-computed statistic on a fixed corpus") {
    // corpus: "x y" ×4, "x z" ×2  → unigrams x=6,y=4,z=2 (n1=12),
    // bigrams (x,y)=4, (x,z)=2 (n2=6)
    val docsDf = (Seq.fill(4)("x y") ++ Seq.fill(2)("x z")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val out = Lexical.pmiCollocations(docsDf, "doc_id", "text", minPair = 2L)
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(out.keySet == Set(("x", "y"), ("x", "z")))
    // pmi(x,y) = ln( (4*12*12)/(6*6*4) ) = ln(4) ; pmi(x,z) = ln( (2*144)/(6*6*2) ) = ln(4)
    val expected = math.round(math.log(4.0) * 1e6)
    assert(out(("x", "y")) == ((4L, expected)))
    assert(out(("x", "z")) == ((2L, expected)))
  }

  test("pmiCollocations: minPair filters low-count pairs") {
    val docsDf = Seq((1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val pairs = Lexical.pmiCollocations(docsDf, "doc_id", "text", minPair = 2L)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(pairs == Set(("a", "b")))
  }

  // -------------------------------------- FastSS edit-distance join

  private def naivePairs(ss: Seq[(Long, String)]): Set[(Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- ss; (ib, sb) <- ss
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
  }

  test("editDistance1Join ≡ naive levenshtein join (all edit paths)") {
    val ss: Seq[(Long, String)] = Seq(
      1L -> "spark", 2L -> "spak" /* deletion */, 3L -> "snark" /* subst */,
      4L -> "sparks" /* insertion */, 5L -> "spark" /* identical */,
      6L -> "shark", 7L -> "park", 8L -> "sprk", 9L -> "query" /* far */,
      10L -> "a", 11L -> "" /* empty vs 1-char = deletion */, 12L -> "b",
      13L -> "ab", 14L -> "ba" /* ED 2: swap must NOT pair */)
    val got = Lexical.editDistance1Join(ss.toDF("sid", "s"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == naivePairs(ss))
    // sanity on specific semantics
    assert(got.contains((10L, 11L)) && got.contains((10L, 12L)))
    assert(!got.contains((13L, 14L))) // transposition is ED 2
  }

  test("editDistance1Join: dist column is the exact distance") {
    val ss = Seq(1L -> "abc", 2L -> "abc", 3L -> "abd").toDF("sid", "s")
    val got = Lexical.editDistance1Join(ss)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  // --------------------------------------------- BPE merge training

  test("bpeTrain: greedy left-to-right merge handles overlapping pairs") {
    // 'aaaa' with merge (a,a) must segment as (aa)(aa), not (aa) a a
    val docsDf = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val (fin, ms) = Lexical.bpeTrain(docsDf, "doc_id", "text", 1)
    assert(ms.head._2 == "a" && ms.head._3 == "a" && ms.head._4 == 3L)
    val seg = fin.select(concat_ws(" ", col("l"))).as[String].head()
    assert(seg == "aa aa #")
  }

  test("bpeTrain: hand-traced 2-merge trajectory with tie-break") {
    // corpus: "ab" ×3, "abc" ×2 → symbols: a b # (×3), a b c # (×2)
    // round 1 pairs: (a,b)=5, (b,#)=3, (b,c)=2, (c,#)=2 → merge (a,b)
    // round 2: (ab,#)=3, (ab,c)=2, (c,#)=2 → merge (ab,#)
    val docsDf = (Seq.fill(3)("ab") ++ Seq.fill(2)("abc")).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val (fin, ms) = Lexical.bpeTrain(docsDf, "doc_id", "text", 2)
    assert(ms == Seq((1, "a", "b", 5L), (2, "ab", "#", 3L)))
    val segs = fin.select(col("tok"), concat_ws(" ", col("l")))
      .as[(String, String)].collect().toMap
    assert(segs == Map("ab" -> "ab#", "abc" -> "ab c #"))
  }

  test("bpeTrain: segmentation always reconstructs the original word") {
    val docsDf = Seq((1L, "table table row scan"), (2L, "table row order"),
      (3L, "scan order table")).toDF("doc_id", "text")
    val (fin, _) = Lexical.bpeTrain(docsDf, "doc_id", "text", 4)
    val rows = fin.select(col("tok"), concat_ws("", col("l")))
      .as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (tok, joined) => assert(joined == tok + "#") }
  }

  test("bpeTrain stops early when the vocabulary is fully merged") {
    // single distinct word "ab": round1 merges (a,b), round2 (ab,#),
    // round3 finds no pairs -> stop with 2 merges, no crash
    val docsDf = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val (fin, ms) = Lexical.bpeTrain(docsDf, "doc_id", "text", 5)
    assert(ms.map(m => (m._2, m._3)) == Seq(("a", "b"), ("ab", "#")))
    val seg = fin.select(concat_ws(" ", col("l"))).as[String].head()
    assert(seg == "ab#")
  }
}
