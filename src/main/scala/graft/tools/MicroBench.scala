package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Dedup

/** Stage-level timings for the dedup hot paths — where inside q32/q44/
  * q31 the time actually goes (run at sf0.1 when tuning).
  *
  * Usage: runMain graft.tools.MicroBench [sfDir]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "micro")
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit = {
      // warm-up + two timed, min reported (same methodology as Bench)
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-28s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
      spark.catalog.clearCache(); System.gc()
    }

    time("tokens_explode")(
      docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+"))).count())
    time("tokens_md5_agg")(
      docs.select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
        .select(col("doc_id"), md5(col("tok")).as("th"))
        .groupBy("doc_id").agg(count(lit(1))).count())
    time("simhash16")(Dedup.simhashBits(docs, "doc_id", "text", 16).count())
    time("simhash32")(Dedup.simhashBits(docs, "doc_id", "text", 32).count())
    time("simhash64")(Dedup.simhashBits(docs, "doc_id", "text", 64).count())
    time("q44_full")(Dedup.simhashNearDups(docs, "doc_id", "text").count())
    time("simhash64_fast")(Dedup.simhashBitsFast(docs, "doc_id", "text", 64).count())
    // the production near-dup form: xxhash64 votes, 64-bit capped
    time("q44_prod_fast")(
      Dedup.simhashNearDupsCapped(docs, "doc_id", "text", fast = true).count())
    // bench-context replica: the SparkEntry wrapper (orderBy) plus the
    // inter-run clearCache+gc Bench performs — isolates harness effects
    // from plan cost when q44's Bench and MicroBench numbers disagree
    def timeGc(label: String)(f: => Long): Unit = {
      f
      val ts = (1 to 2).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$label%-28s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
      spark.catalog.clearCache(); System.gc()
    }
    timeGc("q44_bench_ctx")(
      graft.ops.DedupShapes.queries("q44_simhash_neardups")(spark, dir).count())
    locally {
      // join-phase isolation: fingerprints pre-materialized, so these
      // timers see only band derivation + candidate join + filter
      val sh = Dedup.simhashBits(docs, "doc_id", "text", 32).persist()
      sh.count()
      val hl = sh.select(col("id"), conv(col("simhash"), 2, 10).cast("long").as("hl"))
      val bands = hl.crossJoin(
          spark.range(4).select(col("id").cast("int").as("b")).hint("broadcast"))
        .select(col("id"), col("hl"), col("b"),
          expr(s"CAST(shiftright(hl, (3 - b) * 8) & 255 AS INT)").as("key"))
      def timeWarm2(label: String)(f: => Long): Unit = {
        f
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$label%-28s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
      }
      val salt = 16
      val aSide = bands.withColumn("_s", explode(array((0 until salt).map(lit): _*)))
      val bSide = bands.withColumn("_s", pmod(xxhash64(col("id")), lit(salt)).cast("int"))
      def cand = aSide.as("a").join(bSide.as("b"),
          col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
            col("a._s") === col("b._s") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
          expr("bit_count(a.hl ^ b.hl)").as("hamming"))
        .filter(col("hamming") <= 1)
      if (sys.env.contains("MICRO_EXPLAIN")) cand.explain("formatted")
      timeWarm2("j_cand_nofilter")(aSide.as("a").join(bSide.as("b"),
          col("a.b") === col("b.b") && col("a.key") === col("b.key") &&
            col("a._s") === col("b._s") && col("a.id") < col("b.id")).count())
      timeWarm2("j_cand_filtered")(cand.count())
      timeWarm2("j_cand_distinct")(cand.distinct().count())
      timeWarm2("j_cand_ckpt")(cand.distinct().localCheckpoint(true).count())
      sh.unpersist()
    }
    time("minhash_shingle_arrays")(
      Dedup.docShingleArrays(Dedup.wordBigrams(docs, "doc_id", "text")).count())
    time("q31_full")(Dedup.minhashDedup(docs, "doc_id", "text").count())
    time("q31_capped_raw")(Dedup.minhashDedupCapped(docs, "doc_id", "text").count())
    locally {
      // pair-generation isolation: caches stay warm across the timers
      // (no clearCache between runs)
      val sets = Dedup.docShingleArrays(Dedup.wordBigrams(docs, "doc_id", "text")).persist()
      val bands = Dedup.lshBandsFromArrays(sets, 8, 2).persist()
      bands.count() // materialize both caches outside the timers
      def timeWarm(label: String)(f: => Long): Unit = {
        f
        val ts = (1 to 2).map { _ =>
          val t0 = System.nanoTime(); val n = f
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"$label%-28s ${ts.map(_._1).min}%8.3f s  rows=${ts.head._2}")
      }
      timeWarm("cand_uncapped")(Dedup.lshCandidates(bands).count())
      timeWarm("cand_capped")(Dedup.lshCandidatesCapped(bands, 10000).count())
      // q179's calibration form: hot buckets dropped before expansion
      timeWarm("cand_bucket_dropped")(
        Dedup.lshCandidatesBucketDropped(bands, 64).count())
      sets.unpersist(); bands.unpersist()
    }

    locally {
      // Round-16 (VERDICT r15 item 6): the capped Hamming LOW-ENTROPY
      // path's timing row. A planted 1k-clip digital-silence family —
      // every fingerprint identical, so each of the 4 band buckets
      // holds the whole family — is quadratic for the uncapped
      // per-bucket pair transform (499,500 pairs) and linear for the
      // capped chain (999 consecutive pairs keeping the family
      // connected for dedupCorpus).
      val clips = graft.ops.Multimodal
        .synthesizeSilenceCorpus(spark, 1000).persist()
      clips.count()
      time("audio_silence_uncapped")(Dedup.audioNearDups(clips).count())
      time("audio_silence_capped256")(Dedup.audioNearDupsCapped(clips).count())
      clips.unpersist()
    }

    // q59 stage decomposition
    import graft.ops.CorpusPipeline
    val cfg = CorpusPipeline.Config()
    time("p_quality_gate")(
      docs.filter(CorpusPipeline.qualityGate(col("text"), cfg)).count())
    time("p_exact_window")(
      CorpusPipeline.exactSurvivors(
        docs.filter(CorpusPipeline.qualityGate(col("text"), cfg)), "doc_id", "text").count())
    time("p_lsh_on_ex") {
      val ex = CorpusPipeline.exactSurvivors(
        docs.filter(CorpusPipeline.qualityGate(col("text"), cfg)), "doc_id", "text").persist()
      val n = Dedup.minhashDedupCapped(ex, "doc_id", "text").count()
      ex.unpersist(); n
    }
    time("q59_full")(CorpusPipeline.clean(docs, "doc_id", "text").count())

    // q69 stage isolation
    locally {
      import graft.ops.{CorpusPipeline, TextAnalysis}
      val cfg = CorpusPipeline.RecipeConfig()
      val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
      val bench = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
      time("r_quality")(corpus.filter(CorpusPipeline.qualityGate(col("text"), cfg.base)).count())
      time("r_rep_dup3")(corpus.filter(CorpusPipeline.qualityGate(col("text"), cfg.base)
        && !(TextAnalysis.dup3Frac(col("text")) > 0.5)).count())
      time("r_rep_toptok")(corpus.filter(CorpusPipeline.qualityGate(col("text"), cfg.base)
        && !(TextAnalysis.topTokFrac(col("text")) > 0.2)).count())
      time("r_rep_dup3_only")(corpus.filter(!(TextAnalysis.dup3Frac(col("text")) > 0.5)).count())
      time("r_rep_q_only2")(corpus.filter(CorpusPipeline.qualityGate(col("text"), cfg.base)).count())
      time("r_repetition")(corpus.filter(CorpusPipeline.qualityGate(col("text"), cfg.base)
        && !TextAnalysis.repetitiveFlag(col("text"))).count())
      time("r_decon") {
        val gated = corpus.filter(CorpusPipeline.qualityGate(col("text"), cfg.base)
          && !TextAnalysis.repetitiveFlag(col("text")))
        TextAnalysis.decontaminate(gated, bench, "doc_id", "text", 6, 1L).count()
      }
      time("r_full")(CorpusPipeline.trainingRecipe(corpus, bench, "doc_id", "text").count())
    }

    // PQ training vs serving split (round-6 verdict residual #2): the
    // q96 gate is self-contained (trains + serves in one query — the
    // oracle needs that), but production trains ONCE and serves per
    // query batch. Persist the q95 model to parquet, then time the
    // serving path (ADC shortlist + exact rerank) alone off the
    // standing tables — the number that scales per-query at 100 TB.
    locally {
      import graft.ops.Similarity
      val emb = Tables.load(spark, dir, "embeddings")
      // keep the LAST timed model for the persist step below — timing
      // and persisting must not train twice
      var trained: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
      time("pq_train_model") {
        trained = Similarity.pqModel(emb, "vec_id", "embedding", 8, 7)
        trained._1.count() + trained._2.count()
      }
      val modelDir = "/tmp/graft_pq_model"
      val (cb, codes) = trained
      cb.write.mode("overwrite").parquet(s"$modelDir/codebooks")
      codes.write.mode("overwrite").parquet(s"$modelDir/codes")
      val cbT = spark.read.parquet(s"$modelDir/codebooks")
      val codesT = spark.read.parquet(s"$modelDir/codes")
      time("pq_serve")(
        Similarity.pqServe(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 5, cbT, codesT, shortlist = 100).count())
      // the cluster-partitioned layout: probed clusters prune the
      // codes/vectors reads (the per-query serving shape at 100 TB)
      val idxDir = "/tmp/graft_ivfpq_index"
      Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", idxDir)
      time("ivfpq_serve_indexed")(
        Similarity.servePqIndex(spark, idxDir,
          emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("q_id"), col("embedding").as("qv")),
          k = 5, nProbe = 8, shortlist = 100).count())
      time("q96_selfcontained")(
        Similarity.pqTopK(emb, "vec_id", "embedding",
          col("vec_id") < 5, k = 5, m = 8, seedStep = 7, shortlist = 100).count())
    }

    // quality probe: same training-vs-serving split as the PQ family —
    // the q102 gate retrains its 24 GD iterations in-query (the oracle
    // mirror needs that), but production trains once and SCORES with
    // the standing weight map, a pure map-only corpus pass.
    locally {
      import graft.ops.Classifier
      val feats = Classifier.featurize(docs, "doc_id", "text").persist()
      var w: Map[Int, Long] = null
      time("probe_train_24it") { w = Classifier.train(feats); w.size.toLong }
      time("probe_score_served")(
        Classifier.scoreCorpus(docs, "doc_id", "text", w).count())
      feats.unpersist(blocking = false)
    }
    locally {
      // Incremental substring dedup with vs without the standing
      // bloom of the index fingerprints (q107 composed into q104's
      // path): the bloom turns the index join's probe side into the
      // bloom-positive distinct fps only.
      import graft.ops.{BloomIndex, TextAnalysis}
      val base = docs.filter(col("doc_id") < 2500)
        .select(col("doc_id"), col("text"))
      val delta = docs.filter(col("doc_id") >= 2500)
        .select(col("doc_id"), col("text"))
      val idx = TextAnalysis.substringIndex(base, "doc_id", "text", 8).persist()
      idx.count()
      val bloom = BloomIndex.buildBloom(idx, "fp", 1 << 22, 5).persist()
      bloom.count()
      time("substr_delta_direct")(
        TextAnalysis.substringDedupDelta(delta, idx, "doc_id", "text", 8).count())
      time("substr_delta_bloom")(
        TextAnalysis.substringDedupDelta(delta, idx, "doc_id", "text", 8,
          indexBloom = Some(bloom)).count())
      idx.unpersist(blocking = false); bloom.unpersist(blocking = false)
    }
    locally {
      // BM25 retrieval: self-contained (re-tokenize the corpus per
      // query) vs the persisted inverted index (postings partition-
      // pruned to the query terms' buckets) — the text member of the
      // standing-index trio.
      import graft.ops.TextAnalysis
      val q = Seq("table", "scan", "merge")
      val invDir = "/tmp/graft_inv_index"
      time("bm25_index_build") {
        TextAnalysis.writeInvertedIndex(docs, "doc_id", "text", invDir); 1L
      }
      time("bm25_selfcontained")(
        TextAnalysis.bm25Search(docs, "doc_id", "text", q, k = 20).count())
      time("bm25_serve_indexed")(
        TextAnalysis.serveBm25(spark, invDir, q, k = 20).count())
    }

    locally {
      // round-8 additions: MMR (distributed relevance + driver walk),
      // LPA rounds, basket pair expansion, repeated-ngram report
      val emb = Tables.load(spark, dir, "embeddings")
      time("mmr_top5_pool20")(
        graft.ops.Similarity.mmrTopK(emb, "vec_id", "embedding",
          col("vec_id") === 0, poolK = 20, k = 5).count())
      time("mmr_top10_pool100")(
        graft.ops.Similarity.mmrTopK(emb, "vec_id", "embedding",
          col("vec_id") === 0, poolK = 100, k = 10).count())
      val c = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("u"))
      val edges = c.select(col("u"), (col("u") % 97).as("v"))
        .unionByName(c.select(col("u"), ((col("u") * 3 + 1) % 97).as("v")))
        .filter(col("u") =!= col("v"))
      time("lpa_3_rounds")(
        graft.ops.FeedShapes.labelPropagation(edges, 3).count())
      val items = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand")).hint("broadcast"),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      time("basket_lift_pairs")(
        graft.ops.Analytics.basketLiftOf(items, "okey", "brand", 5).count())
      time("repeated_8grams")(
        graft.ops.TextAnalysis.repeatedNgrams(docs, "doc_id", "source", "text",
          8, 2, 30).count())
    }

    locally {
      // round-8b additions: k-core peel rounds, evaluation metrics,
      // day-grain time-series paths
      val c = Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("u"))
      val edges = c.select(col("u"), (col("u") % 211).as("v"))
        .unionByName(c.select(col("u"), ((col("u") * 7 + 3) % 211).as("v")))
        .unionByName(c.filter(col("u") % 3 === 0)
          .select(col("u"), ((col("u") * 13 + 5) % 431).as("v")))
        .filter(col("u") =!= col("v"))
      time("kcore_4_rounds")(
        graft.ops.FeedShapes.kCore(edges, 3, 4).count())
      time("auc_exact")(
        graft.ops.Evaluation.scoreAuc(spark, dir).count())
      time("calibration_bins")(
        graft.ops.Evaluation.calibrationBins(spark, dir).count())
      time("seasonal_decompose")(
        graft.ops.Temporal.seasonalDecompose(spark, dir).count())
      time("ewma_activity")(
        graft.ops.Temporal.ewmaActivity(spark, dir).count())
    }
    spark.stop()
  }
}
