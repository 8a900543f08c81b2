package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts for the round-6 curation operators: fuzzy
  * decontamination, PII audit with Luhn validation, DSIR importance
  * resampling, boilerplate span detection, and token-budget mixture
  * execution. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("luhnValid accepts real checksums and rejects off-by-one, across lengths") {
    val cases = Seq(
      ("4111111111111111", true),   // 16-digit Visa test number
      ("4111111111111112", false),  // checksum broken
      ("4222222222222", true),      // 13-digit Visa test number
      ("378282246310005", true),    // 15-digit Amex test number
      ("378282246310006", false))
    val got = cases.map(_._1).toDF("n")
      .select(col("n"), CurationOps.luhnValid(col("n")).as("v"))
      .as[(String, Boolean)].collect().toMap
    cases.foreach { case (n, want) => assert(got(n) == want, n) }
  }

  test("piiAudit: counts per kind; has_pii ignores Luhn-invalid digit runs") {
    val d = Seq(
      (1L, "mail me at a.b@x.org and c@y.io today"),
      (2L, "cards 4111111111111111 and 4111111111111112 here"),
      (3L, "just 4111111111111112 noise"), // invalid only → not PII
      (4L, "call 555-0142 or 555-0199"),
      (5L, "nothing sensitive at all"),
      // 17-digit run whose 16-digit prefix Luhn-validates: must be
      // rejected WHOLE, not scanned as a card (round-6 ADVICE fix).
      (6L, "order 41111111111111113 shipped")).toDF("doc_id", "text")
    val got = CurationOps.piiAudit(d, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 0L, 0L, 0L, true)))
    assert(got(2L) == ((2L, 0L, 1L, 1L, 0L, true)))
    assert(got(3L) == ((3L, 0L, 0L, 1L, 0L, false)))
    assert(got(4L) == ((4L, 0L, 0L, 0L, 2L, true)))
    assert(got(5L) == ((5L, 0L, 0L, 0L, 0L, false)))
    assert(got(6L) == ((6L, 0L, 0L, 0L, 0L, false)))
  }

  test("fuzzyContamination: containment is of the BENCHMARK doc's grams; threshold filters") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text") // 2 distinct 3-grams
    val corpus = Seq(
      (1L, "alpha beta gamma delta tail"),      // both grams → frac 1.0
      (2L, "alpha beta gamma other stuff here"),// 1 of 2 → 0.5
      (3L, "entirely different words only")).toDF("doc_id", "text")
    val got = CurationOps.fuzzyContamination(corpus, bench, "doc_id", "text", n = 3, minFrac = 0.5)
      .select(col("id"), col("overlap_frac")).as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 1.0, 2L -> 0.5))
    // raising the threshold drops the partial match
    val strict = CurationOps.fuzzyContamination(corpus, bench, "doc_id", "text", n = 3, minFrac = 0.75)
      .select(col("id")).as[Long].collect().toSet
    assert(strict == Set(1L))
  }

  test("importanceResample: on a corpus with a real domain signal, target-vocab docs win") {
    // target docs speak a disjoint vocabulary; raw docs another.
    val rows = (0 until 40).map { i =>
      if (i % 4 == 0) (i.toLong, "tgt", "curated quality prose sentences flowing nicely here")
      else (i.toLong, "raw", "spam junk noise garbage filler padding repeated blather")
    }
    val d = rows.toDF("doc_id", "dom", "text")
    val top = CurationOps.importanceResample(d, "doc_id", "text",
      col("dom") === "tgt", k = 10)
    val ids = top.select(col("id")).as[Long].collect().toSet
    assert(ids == (0 until 40 by 4).map(_.toLong).toSet) // exactly the 10 target docs
    // rnk is 1..k, dense, ordered by score then id
    val rnks = top.select(col("rnk")).as[Int].collect().toSeq
    assert(rnks.sorted == (1 to 10))
  }

  test("importanceResample is deterministic under repartitioning") {
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val a = CurationOps.importanceResample(d, "doc_id", "text",
      col("source").isin("src1"), k = 20).collect().toSeq
    val b = CurationOps.importanceResample(d.repartition(17), "doc_id", "text",
      col("source").isin("src1"), k = 20).collect().toSeq
    assert(a == b)
  }

  test("boilerplateSpans surfaces only spans crossing the doc-frequency floor") {
    val tail = "all rights reserved forever"
    val d = (1 to 30).map { i =>
      val base = s"unique${i}a unique${i}b unique${i}c unique${i}d"
      (i.toLong, if (i <= 20) s"$base $tail" else base)
    }.toDF("doc_id", "text")
    val got = CurationOps.boilerplateSpans(d, "doc_id", "text", n = 3, minDocs = 20, topK = 50)
      .select(col("gram"), col("n_docs")).as[(String, Long)].collect().toMap
    assert(got.keySet == Set("all rights reserved", "rights reserved forever"))
    assert(got.values.toSet == Set(20L))
  }

  test("budgetSample: budget binds per domain, boundary doc kept, deterministic") {
    val d = Seq(
      (1L, "a", "t t t t"), (2L, "a", "t t t t"), (3L, "a", "t t t t"),
      (4L, "b", "t t")).toDF("doc_id", "src", "text")
    // budget 6: rank order is md5-driven; first doc (4 tokens) + second
    // doc STARTS below 6 so it is kept (cum 8), third starts at 8 → dropped.
    val got = CurationOps.budgetSample(d, "doc_id", "text", "src", 6L, "s1")
    val byDom = got.select(col("src"), col("doc_id")).as[(String, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDom("a").size == 2)   // 2 of 3 docs fit under the boundary rule
    assert(byDom("b") == Set(4L))  // under budget entirely
    // pure function of (seed, id): same survivors under different partitioning
    val again = CurationOps.budgetSample(d.repartition(7), "doc_id", "text", "src", 6L, "s1")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(again == byDom.values.flatten.toSet)
    // cum_tokens is an exact prefix sum of n_tokens in output order
    val rows = got.filter(col("src") === "a")
      .orderBy(col("cum_tokens")).select(col("n_tokens"), col("cum_tokens"))
      .as[(Long, Long)].collect()
    assert(rows.scanLeft(0L)(_ + _._1).tail.sameElements(rows.map(_._2)))
  }

  test("corpusDiff: added/removed/changed statuses, unchanged suppressed, symmetric swap") {
    val prev = Seq((1L, "same text"), (2L, "old text"), (3L, "dropped doc"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "same text"), (2L, "new text"), (4L, "fresh doc"))
      .toDF("doc_id", "text")
    val got = CurationOps.corpusDiff(prev, cur, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // swapping snapshots flips added/removed and keeps changed
    val rev = CurationOps.corpusDiff(cur, prev, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(rev == Map(2L -> "changed", 3L -> "added", 4L -> "removed"))
  }

  test("urlHosts/hostFrequency/dropBlockedHosts: extraction, www-strip, blocklist drop") {
    val d = Seq(
      (1L, "intro https://www.good.example/a and https://spam.example/x end"),
      (2L, "only https://good.example/b/page here"),
      (3L, "no urls at all in this one")).toDF("doc_id", "text")
    val hosts = CurationOps.urlHosts(d, "doc_id", "text")
      .select(col("doc_id"), col("host")).as[(Long, String)].collect().toSet
    assert(hosts == Set((1L, "good.example"), (1L, "spam.example"), (2L, "good.example")))
    val freq = CurationOps.hostFrequency(d, "doc_id", "text")
      .as[(String, Long, Long)].collect().toSet
    assert(freq == Set(("good.example", 2L, 2L), ("spam.example", 1L, 1L)))
    val blocked = Seq("spam.example").toDF("host")
    val kept = CurationOps.dropBlockedHosts(d, "doc_id", "text", blocked)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(2L, 3L)) // doc 1 dies for ONE blocked url; url-free docs survive
  }

  test("canonicalizeUrl: each normalization rule, and the non-collapses") {
    val cases = Seq(
      // scheme+host case, www, trailing slash
      "HTTPS://WWW.Site.Example.COM/Path/" -> "https://site.example.com/Path",
      // default ports dropped, non-default kept
      "https://a.example:443/x" -> "https://a.example/x",
      "http://a.example:80/x" -> "http://a.example/x",
      "https://a.example:8443/x" -> "https://a.example:8443/x",
      // tracking params stripped wherever they sit; real params survive
      "https://a.example/x?utm_source=f" -> "https://a.example/x",
      "https://a.example/x?utm_campaign=c&page=2" -> "https://a.example/x?page=2",
      "https://a.example/x?page=2&gclid=abc" -> "https://a.example/x?page=2",
      "https://a.example/x?fbclid=1&utm_medium=m" -> "https://a.example/x",
      // fragment dropped; path case preserved; http ≠ https
      "https://a.example/x#sec2" -> "https://a.example/x",
      "http://a.example/x" -> "http://a.example/x",
      // bare host with slash; query-only url
      "https://a.example/" -> "https://a.example")
    val got = cases.zipWithIndex
      .map { case ((in, _), i) => (i.toLong, in) }.toDF("id", "url")
      .select(col("id"), CurationOps.canonicalizeUrl(col("url")).as("c"))
      .as[(Long, String)].collect().toMap
    cases.zipWithIndex.foreach { case ((in, want), i) =>
      assert(got(i.toLong) == want, s"canonicalizeUrl($in)") }
  }

  test("canonicalUrlDedup groups crawl variants; keeper is the min id") {
    val d = Seq(
      (5L, "https://www.a.example/p?utm_source=x"),
      (3L, "HTTPS://A.Example/p/"),
      (9L, "https://a.example:443/p#top"),
      (7L, "http://a.example/p")).toDF("doc_id", "url")
    val got = CurationOps.canonicalUrlDedup(d, "doc_id", "url")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("https://a.example/p", 3L, 3L),
      ("http://a.example/p", 1L, 7L)))
  }

  test("weightedSample: deterministic, without replacement, weight-sensitive") {
    val d = (1L to 100L).map(i => (i, if (i == 42L) 50L else 1L)).toDF("id", "w")
    val pick = CurationOps.weightedSample(d, "id", col("w"), 10, "seedA")
      .select("id").as[Long].collect().toSeq
    assert(pick.distinct.size == 10) // without replacement
    // pure function of (seed, id, w): repartition changes nothing
    val again = CurationOps.weightedSample(d.repartition(17), "id", col("w"), 10, "seedA")
      .select("id").as[Long].collect().toSeq
    assert(pick == again)
    // weight proportionality: across seeds, the w=50 row is selected
    // into the top-10 far more often than any w=1 row can be
    val seeds = (1 to 20).map(i => s"s$i")
    val hits = seeds.count { sd =>
      CurationOps.weightedSample(d, "id", col("w"), 10, sd)
        .select("id").as[Long].collect().contains(42L)
    }
    assert(hits >= 15, s"w=50 row selected only $hits/20 — not weight-sensitive")
  }

  test("materializeEpochs: floor copies for all, fractional share upsampled, deterministic") {
    val d = (1L to 200L).map(i => (i, if (i <= 100) "a" else "b")).toDF("doc_id", "src")
    val plan = Seq(("a", 2.5), ("b", 1.0)).toDF("src", "epochs")
    val out = CurationOps.materializeEpochs(d, "doc_id", "src", plan, "s1")
    val byDoc = out.groupBy(col("doc_id")).count()
      .as[(Long, Long)].collect().toMap
    // every doc appears at least floor(epochs) times
    assert((1L to 100L).forall(i => byDoc(i) >= 2 && byDoc(i) <= 3))
    assert((101L to 200L).forall(i => byDoc(i) == 1))
    // the fractional share lands near 0.5 of domain a (md5-uniform)
    val extra = (1L to 100L).count(i => byDoc(i) == 3)
    assert(extra > 30 && extra < 70, s"extra=$extra")
    // epoch stamps are dense 1..n per doc
    val ep = out.filter(col("doc_id") === 1L).select(col("epoch"))
      .as[Long].collect().sorted.toSeq
    assert(ep == (1L to byDoc(1L)))
    // pure function of (seed, id): partitioning-invariant
    val again = CurationOps.materializeEpochs(d.repartition(13), "doc_id", "src", plan, "s1")
      .groupBy(col("doc_id")).count().as[(Long, Long)].collect().toMap
    assert(again == byDoc)
  }

  test("curationRecipe with all extra stages disabled equals trainingRecipe") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    val base = CorpusPipeline.trainingRecipe(corpus, bench, "doc_id", "text")
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    val curated = CorpusPipeline.curationRecipe(corpus, bench, "doc_id", "text", "source",
        CorpusPipeline.CurationConfig(piiGate = false, fuzzyMinFrac = 2.0,
          bpMinDocs = Long.MaxValue, budgetTokens = None))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(curated == base)
  }

  test("curationRecipe: PII, fuzzy, boilerplate, and budget stages each drop docs") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val planted = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0).select(
      col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 5 === 0, lit(" reach me a.b@example.org ok")).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          lit(" subscribe to our newsletter all rights reserved")).otherwise(lit("")))
        .as("text"),
      col("lang"), col("source"))
    val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
    def run(cfg: CorpusPipeline.CurationConfig): Set[Long] =
      CorpusPipeline.curationRecipe(planted, bench, "doc_id", "text", "source", cfg)
        .select("doc_id").as[Long].collect().toSet
    val off = CorpusPipeline.CurationConfig(piiGate = false, fuzzyMinFrac = 2.0,
      bpMinDocs = Long.MaxValue, budgetTokens = None)
    // Earlier drops can change which duplicate becomes a component's
    // canonical survivor, so stage-on survivor sets are NOT subsets of
    // the stage-off set — assert each stage removes its targets and
    // genuinely changes the outcome instead.
    val all = run(off)
    assert(all.exists(_ % 5 == 0), "planted-PII docs survive with the gate off")
    val pii = run(off.copy(piiGate = true))
    assert(pii.nonEmpty && pii.forall(_ % 5 != 0), "PII gate drops every planted doc")
    val fuzzy = run(off.copy(fuzzyMinFrac = 0.03))
    assert(fuzzy.nonEmpty && (all -- fuzzy).nonEmpty)
    val bp = run(off.copy(bpMinDocs = 20L, bpMaxFrac = 0.02))
    assert(bp.nonEmpty && bp.forall(_ % 3 != 0), "coverage cut drops every tailed doc")
    val budget = run(off.copy(budgetTokens = Some(100L)))
    assert(budget.nonEmpty && (all -- budget).nonEmpty)
  }

  test("piiAudit is map-only and composes onto a streaming frame") {
    val in = memStream[(Long, String)]
    val audited = CurationOps.piiAudit(
      in.toDF.toDF("doc_id", "text"), "doc_id", "text")
    assert(audited.isStreaming) // no agg/join snuck into the audit plan
    val q = audited.writeStream.format("memory").queryName("pii_stream")
      .outputMode("append").start()
    in.addData((1L, "mail a.b@x.org"), (2L, "card 4111111111111111"), (3L, "clean"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("pii_stream")
      .select(col("doc_id"), col("has_pii")).as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false))
  }

  test("qualityRuleScreen: each rule fails exactly the doc built to fail it; empty text fails all length rules") {
    // 35 words of distinct text passes everything (stopwords 'the a of' present)
    val good = "the a of " + (1 to 32).map(i => s"word$i").mkString(" ")
    // each trap doc fails exactly ONE rule and passes the other three:
    // r1 too short; r2 mean word length > 10 (words kept distinct so r4
    // holds); r3 no stopwords; r4 one 6-char word repeated (mean length
    // stays ≥ 3)
    val shortDoc = "the a of just short"
    val longWords = "the a of " + (1 to 32).map(i => "x" * 20 + i).mkString(" ")
    val noStop = (1 to 35).map(i => s"word$i").mkString(" ")
    val repeated = "the a of " + Seq.fill(37)("dupdup").mkString(" ")
    val d = Seq(
      ("s1", good), ("s1", shortDoc), ("s1", longWords),
      ("s1", noStop), ("s1", repeated), ("s2", "")).toDF("source", "text")
    val got = CurationOps.qualityRuleScreen(d, "source", "text")
      .orderBy(col("source"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect().toList
    // s1: 5 docs, 1 passes all; one failure per rule except r2 is also
    // missed by nothing else (each trap doc passes the other rules)
    assert(got == List(
      ("s1", 5L, 1L, 1L, 1L, 1L, 1L, 200000L),
      ("s2", 1L, 0L, 1L, 1L, 1L, 1L, 0L)))
  }

  test("temperatureMixture: sqrt weights upweight the tail; allocs sum to ~1; exact on a hand case") {
    // two sources, 9:1 token split → shares 0.9/0.1, weights sqrt:
    // 948683/316228, allocs re-normalized
    val d = Seq(("big", (1 to 90).map(_ => "t").mkString(" ")),
      ("small", (1 to 10).map(_ => "t").mkString(" "))).toDF("source", "text")
    val got = CurationOps.temperatureMixture(d, "source", "text")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val (bigTok, bigShare, bigW, bigA) = got("big")
    val (smallTok, smallShare, smallW, smallA) = got("small")
    assert(bigTok == 90L && smallTok == 10L)
    assert(bigShare == 900000L && smallShare == 100000L)
    assert(bigW == math.round(math.sqrt(0.9) * 1e6) &&
      smallW == math.round(math.sqrt(0.1) * 1e6))
    // tail source's sampling share (25%) is far above its raw share (10%)
    assert(smallA > 2 * smallShare)
    assert(math.abs(bigA + smallA - 1000000L) <= 1)
  }
}
