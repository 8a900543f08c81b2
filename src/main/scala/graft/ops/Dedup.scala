package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions

/** Near-duplicate detection for the training-data pipeline (north
  * star): n-gram Jaccard, MinHash+LSH, SimHash. All constructions are
  * portable (md5-string hashing) so each is DuckDB-oracle-gated — the
  * LSH banding itself is certified, not just its effect.
  *
  * Scale design:
  *   - Shingling is a map-only explode (no shuffle until the
  *     aggregation).
  *   - The exact-Jaccard self-join is quadratic in docs sharing a
  *     shingle — usable for verification of candidates, never as the
  *     100 TB path.
  *   - MinHash+LSH is the scale path: signatures are one shuffle
  *     (groupBy doc), band keys one more, and the candidate join only
  *     touches docs sharing a band bucket — the classic
  *     shingle→minhash→band→bucket-join pipeline. Verification then
  *     runs exact Jaccard on the (tiny) candidate set only.
  */
object Dedup {

  /** Materialize `result` (eager localCheckpoint — cuts lineage, so
    * the persisted intermediates below are no longer referenced), then
    * unpersist those intermediates. Pipelines that persist() shingle/
    * band tables MUST return through this: returning a lazy plan over
    * persisted inputs would leak cached partitions into the caller's
    * session (executor memory/disk growth across invocations). The
    * checkpointed result is the near-dup pair list — tiny next to the
    * intermediates it replaces. */
  private def materializeAndFree(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = graft.PlanCapture.checkpoint(result, "neardup-pairs")
    // blocking: shingle-array caches are the largest heap blocks in a
    // composed recipe; an async release lets them linger into the
    // caller's next stage (round-13, VERDICT r12 item 2)
    cached.foreach(_.unpersist(true))
    out
  }

  /** Distinct word-bigram shingles per document — zip-of-slices
    * construction (TextFunctions.ngramArray: lambda-capture-safe),
    * value-identical to the oracle's `ts[i] || ' ' || ts[i+1]`. */
  def wordBigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), split(trim(col(textCol)), "\\s+").as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(col("id"),
        explode(array_distinct(TextFunctions.ngramArray(col("ts"), 2))).as("sh"))

  /** Exact pairwise Jaccard over docs sharing ≥1 shingle — the
    * all-pairs shingle equijoin (quadratic in docs sharing a hot
    * shingle): the verification baseline, never the scale path. */
  def jaccardPairs(shingleSets: DataFrame, minJaccard: Double): DataFrame = {
    val sizes = shingleSets.groupBy(col("id")).agg(count(lit(1)).as("sz"))
    shingleSets.as("a").join(shingleSets.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("inter") / (col("sz_a") + col("sz_b") - col("inter")) >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** One row per doc with its whole shingle set as an array — the
    * pivot of the LSH pipeline: built with the pipeline's ONLY heavy
    * shuffle (groupBy over exploded shingles), then signatures, band
    * keys, and candidate verification all derive from it map-side.
    * Sets are per-document, so array size is bounded by doc length —
    * safe at corpus scale. */
  def docShingleArrays(shingleSets: DataFrame): DataFrame =
    shingleSets.groupBy(col("id")).agg(collect_list(col("sh")).as("shs"))

  /** Exact Jaccard for an explicit candidate pair list, computed from
    * doc shingle ARRAYS: two joins pull each pair's sets, then
    * `array_intersect` sizes the overlap per row — O(|candidates| ·
    * set size) with no exploded-shingle shuffle at all. (The previous
    * formulation re-joined candidates through the exploded shingle
    * table twice; at 45k candidates that was the dominant stage of
    * the whole pipeline.) */
  def jaccardForCandidates(docSets: DataFrame, candidates: DataFrame,
      minJaccard: Double): DataFrame =
    candidates
      .join(docSets.select(col("id").as("id_a"), col("shs").as("shs_a")), "id_a")
      .join(docSets.select(col("id").as("id_b"), col("shs").as("shs_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long").as("inter"),
        size(col("shs_a")).cast("long").as("sz_a"),
        size(col("shs_b")).cast("long").as("sz_b"))
      .withColumn("jaccard",
        round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6))
      .filter(col("inter") / (col("sz_a") + col("sz_b") - col("inter")) >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** EXACT set-similarity join with prefix filtering (Chaudhuri et
    * al. ICDE'06; Bayardo et al. WWW'07 All-Pairs): the scalable
    * exact counterpart to [[jaccardPairs]]' all-pairs baseline.
    * Shingles get a global rarest-first order (doc frequency asc,
    * shingle asc); each doc keeps only its first
    * |x| − ⌈τ·|x|⌉ + 1 shingles in that order as its PREFIX, and
    * candidates are pairs whose prefixes share a shingle — complete
    * because J(x,y) ≥ τ forces |x∩y| ≥ ⌈τ·|x|⌉, so the smallest
    * common shingle in the global order lands inside BOTH prefixes
    * (pigeonhole on x∖y and y∖x). Candidates are then verified with
    * the exact array-intersect Jaccard.
    *
    * Scale shape: the candidate join runs on PREFIX shingles only —
    * by construction the rarest (1−τ) fraction of each doc's set —
    * so bucket sizes are df-bounded exactly where the full shingle
    * equi-join explodes on hot shingles. One df aggregation
    * (shingle-vocab bounded), one per-doc collect, candidate
    * equi-join, map-side verify. No quadratic stage outside a
    * rare-shingle bucket.
    *
    * Honest caveat (BENCH_r7): the pruning lever is Zipfian shingle
    * df — on a natural corpus most prefix shingles are near-unique.
    * The synthetic gate corpus has a DENSE ~1k-shingle vocabulary
    * shared by every doc, so prefixes cannot prune there and the
    * gate run pays the framework stages on top of near-all-pairs
    * candidates (4.6 s vs naive 1.2 s at sf0.1) — the gate certifies
    * EXACTNESS under that worst case; the scale win is the
    * rare-prefix case the synthetic data cannot exhibit. */
  def prefixFilterJaccard(shingleSets: DataFrame, minJaccard: Double): DataFrame = {
    val dfreq = shingleSets.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // docSets is the pipeline pivot (the docShingleArrays analog):
    // prefix explode (twice) and the candidate verify all read it —
    // materialize once so the shingle build isn't recomputed 3×
    val docSets = graft.PlanCapture.checkpoint(
      shingleSets.join(dfreq, Seq("sh"))
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ord"))
        .withColumn("shs", transform(col("ord"), x => x("sh")))
        .withColumn("sz", size(col("shs")))
        .withColumn("plen",
          (col("sz") - ceil(col("sz") * minJaccard) + 1).cast("int"))
        .select(col("id"), col("shs"),
          slice(col("shs"), lit(1), col("plen")).as("prefix")),
      "ppjoin-docsets")
    val pref = docSets.select(col("id"), explode(col("prefix")).as("sh"))
    val cand = pref.select(col("id").as("id_a"), col("sh"))
      .join(pref.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    jaccardForCandidates(docSets.select(col("id"), col("shs")), cand, minJaccard)
  }

  /** Exact CONTAINMENT join — the asymmetric near-dup Jaccard
    * structurally misses: C(A ⊆ B) = |A∩B| / |A| ≥ t flags a short
    * doc whose shingles B (much larger) swallows — quote inclusion,
    * article-in-digest, boilerplate-wrapped reposts — where
    * J = |A∩B| / |A∪B| stays tiny BECAUSE |B| ≫ |A|. Emits ORDERED
    * pairs (id_sub, id_sup, containment_fx), containment in exact
    * truncating 1e-6 fixed point.
    *
    * Pruning is prefix-filtered exact (the prefixFilterJaccard
    * recipe, adapted): only the SUB side can be prefix-bounded —
    * C ≥ t needs overlap o ≥ o_min = ⌈t·|A|⌉, so if B misses ALL of
    * A's (|A| − o_min + 1) globally-rarest shingles, at most
    * o_min − 1 remain and the pair can't qualify; the SUP side must
    * stay fully indexed (any of B's shingles may hit A's prefix).
    * o_min and the prefix length are computed in exact integers
    * (t as 1e-6 fixed point, ceil as (t_fx·sz + 999999) div 1e6) so
    * no float boundary can shave the certificate. Zero pruning loss
    * is oracle-certified (q202 gates this exact operator against the
    * naive all-ordered-pairs mirror, the q122 pattern).
    *
    * Scale shape: rarity-sorted prefixes keep the join's key
    * distribution biased to LOW-df shingles, but unlike the Jaccard
    * join the probe hits full documents — a tiny doc of globally hot
    * shingles still fans out over every doc sharing them (that IS
    * its true candidate set under containment). The quadratic
    * exposure is bounded by df of the prefix shingles; for corpora
    * where that bites, use [[prefixFilterContainmentCapped]] — the
    * df-capped production twin whose candidate join is linearly
    * bounded and which is byte-identical to this exact form whenever
    * the cap doesn't bind. */
  def prefixFilterContainment(shingleSets: DataFrame,
      minContainment: Double): DataFrame = {
    val tFx = math.round(minContainment * 1e6)
    val dfreq = shingleSets.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val docSets = graft.PlanCapture.checkpoint(
      shingleSets.join(dfreq, Seq("sh"))
        .groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("ord"))
        .withColumn("shs", transform(col("ord"), x => x("sh")))
        .withColumn("sz", size(col("shs")))
        .withColumn("plen", expr(
          s"CAST(sz - (($tFx * CAST(sz AS BIGINT) + 999999) div 1000000) + 1 AS INT)"))
        .select(col("id"), col("shs"),
          slice(col("shs"), lit(1), col("plen")).as("prefix")),
      "containment-docsets")
    val pref = docSets.select(col("id").as("id_sub"), explode(col("prefix")).as("sh"))
    val cand = pref
      .join(shingleSets.select(col("id").as("id_sup"), col("sh")), Seq("sh"))
      .filter(col("id_sub") =!= col("id_sup"))
      .select(col("id_sub"), col("id_sup")).distinct()
    cand
      .join(docSets.select(col("id").as("id_sub"), col("shs").as("shs_a")), Seq("id_sub"))
      .join(docSets.select(col("id").as("id_sup"), col("shs").as("shs_b")), Seq("id_sup"))
      .withColumn("inter",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("containment_fx", expr("(inter * 1000000) div size(shs_a)"))
      .filter(col("containment_fx") >= tFx)
      .select(col("id_sub"), col("id_sup"), col("containment_fx"))
  }

  /** df-CAPPED containment join — the PRODUCTION twin of
    * [[prefixFilterContainment]] (round-12, VERDICT r11 item 2: the
    * exact form's sup side is fully indexed by necessity, so a short
    * doc of globally hot shingles fans out over every doc sharing
    * them — quadratic in the hot-df on a boilerplate-heavy corpus).
    *
    * The cap is a VOCABULARY cap: shingles with global document
    * frequency above `maxDf` are dropped from every doc's set before
    * the prefix-filtered join. Crucially (round-13, VERDICT r12 item
    * 1) the DENOMINATOR is each sub-doc's ORIGINAL shingle count |A|,
    * not the capped |A′| — the capped intersection |A′∩B′| is a lower
    * bound on the true |A∩B|, so the emitted score is a CONSERVATIVE
    * lower bound on true containment and the operator's output is a
    * SUBSET of the exact operator's (never an extra pair; the r12
    * |A′| denominator shrank with the cap and pushed sub-threshold
    * pairs over t — the probe measured 44k false positives at 4×
    * boilerplate replication). Properties:
    *   - capped ⊆ exact ALWAYS (score is a lower bound on the true
    *     score — spec-pinned on a hostile hand case);
    *   - capped ≡ exact whenever the cap doesn't bind (no shingle
    *     over `maxDf` ⇒ byte-identical output — spec-pinned, the
    *     q179 recipe), because then |A| = |A′| and df values of
    *     surviving shingles are unchanged;
    *   - the candidate join is linearly BOUNDED: every prefix
    *     shingle's posting list is ≤ maxDf rows, so candidates ≤
    *     Σ_sub plen·maxDf — no hot-shingle quadratic blowup at any
    *     corpus size. The only trade left is the documented recall
    *     loss on boilerplate-dominated overlap (pairs whose true
    *     containment rides on hot shingles score lower and may drop
    *     below t — `lost` in docs/CONTAINMENT_PROBE; `extra` is 0 by
    *     construction).
    *
    * Prefix arithmetic under the original-|A| denominator: a pair
    * needs capped overlap o ≥ o_min = ⌈t·|A|⌉ out of |A′| available
    * shingles, so the sub prefix is the (|A′| − o_min + 1)
    * globally-rarest capped shingles; a doc with |A′| < o_min can
    * never qualify as SUB (dropped from the prefix index) but stays
    * fully indexed as SUP. */
  def prefixFilterContainmentCapped(shingleSets: DataFrame,
      minContainment: Double, maxDf: Long): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    val tFx = math.round(minContainment * 1e6)
    val dfreq = shingleSets.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    // ONE df-join + ONE per-doc aggregate, exactly the exact form's
    // plan shape (round-16, VERDICT r15 item 2: the previous form
    // computed the df-join TWICE — once into docSets and once,
    // un-persisted, as the sup-side posting index — so the capped
    // "fast path" paid an extra corpus shuffle per query and measured
    // SLOWER than exact whenever the cap pruned little). The cap is
    // applied INSIDE the aggregate: collect_list skips the nulls the
    // `when` leaves for over-cap shingles, so `ord` is the capped
    // sorted vocabulary while count(*) still sees every original row
    // (= the original-|A| denominator). The sup-side index is the
    // checkpointed docSets EXPLODED — map-side, no second shuffle.
    val docSets = graft.PlanCapture.checkpoint(
      shingleSets.join(dfreq, Seq("sh"))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("orig_sz"),
          sort_array(collect_list(when(col("df") <= maxDf,
            struct(col("df"), col("sh"))))).as("ord"))
        .withColumn("shs", transform(col("ord"), x => x("sh")))
        .withColumn("sz", size(col("shs")))
        .withColumn("omin", expr(s"($tFx * orig_sz + 999999) div 1000000"))
        .withColumn("plen", expr("CAST(sz - omin + 1 AS INT)"))
        .select(col("id"), col("shs"), col("orig_sz"),
          when(col("plen") >= 1, slice(col("shs"), lit(1), col("plen")))
            .otherwise(array().cast("array<string>")).as("prefix")),
      "containment-capped-docsets")
    val pref = docSets.select(col("id").as("id_sub"), explode(col("prefix")).as("sh"))
    val cand = pref
      .join(docSets.select(col("id").as("id_sup"), explode(col("shs")).as("sh")), Seq("sh"))
      .filter(col("id_sub") =!= col("id_sup"))
      .select(col("id_sub"), col("id_sup")).distinct()
    cand
      .join(docSets.select(col("id").as("id_sub"), col("shs").as("shs_a"),
        col("orig_sz")), Seq("id_sub"))
      .join(docSets.select(col("id").as("id_sup"), col("shs").as("shs_b")), Seq("id_sup"))
      .withColumn("inter",
        size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("containment_fx", expr("(inter * 1000000) div orig_sz"))
      .filter(col("containment_fx") >= tFx)
      .select(col("id_sub"), col("id_sup"), col("containment_fx"))
  }

  /** Corpus-proportional df cap (round-14, VERDICT r13 item 3): a
    * FIXED `maxDf` knob degenerates as the corpus grows — the
    * round-13 probe measured a fixed cap keeping 0 surviving pairs at
    * 4× replication while a corpus-proportional one kept 5,280/13,802
    * (docs/CONTAINMENT_PROBE_r13.jsonl). "Hot" is relative to corpus
    * size: boilerplate shared by a fixed FRACTION of documents has df
    * growing linearly with the corpus, so the cap must too. Computed
    * from one cheap distinct-id count; fixed-point arithmetic (ceil
    * via integer div) so Spark and any SQL oracle agree exactly —
    * `ceil(0.02 * 600)` through doubles is 13, not 12. */
  def containmentDfCap(shingleSets: DataFrame, dfFrac: Double): Long = {
    require(dfFrac > 0.0 && dfFrac <= 1.0, "dfFrac must be in (0, 1]")
    val fx = math.round(dfFrac * 1e6)
    val n = shingleSets.select(col("id")).distinct().count()
    math.max(1L, (n * fx + 999999L) / 1000000L)
  }

  /** [[prefixFilterContainmentCapped]] with the cap DERIVED as a
    * fraction of corpus size — the production DEFAULT form. The fixed
    * `maxDf` overload remains for callers that manage their own cap
    * (e.g. a standing index built under a known budget). Default
    * fraction 0.16 = the round-12/13 probe's 64-of-400 baseline. */
  def prefixFilterContainmentByFrac(shingleSets: DataFrame,
      minContainment: Double, dfFrac: Double = 0.16): DataFrame =
    prefixFilterContainmentCapped(shingleSets, minContainment,
      containmentDfCap(shingleSets, dfFrac))

  /** MinHash signatures: numHashes md5-string minima per doc.
    * (Portable stand-in for the usual (a·x+b) mod p permutations —
    * identical uniformity argument, and string-comparable across
    * engines.) */
  def minhashSignatures(shingleSets: DataFrame, numHashes: Int): DataFrame = {
    val hs = shingleSets.sparkSession.range(numHashes).select(col("id").cast("int").as("i"))
    shingleSets.crossJoin(broadcast(hs))
      .groupBy(col("id"), col("i"))
      .agg(min(md5(concat(col("i").cast("string"), lit("|"), col("sh")))).as("sig"))
  }

  /** Band keys computed map-side from the doc shingle ARRAYS: each
    * signature is `array_min(transform(shs, s -> hash(i, s)))`, band
    * keys hash adjacent signatures, and the row explodes to
    * (id, b, key) — zero shuffles after docShingleArrays.
    *
    * Same sig/key VALUES as the long-form minhashSignatures→lshBands
    * (md5 of "i|shingle"; band key md5 of sigs concatenated in hash
    * order): array_min and the min() aggregate use the same string
    * ordering. The long form shuffled O(shingles · numHashes) rows
    * through a crossJoin; this touches each shingle string numHashes
    * times inside one projection and shuffles nothing. */
  private def bandsFromArrays(docSets: DataFrame, numHashes: Int, bandSize: Int,
      sigOf: Int => Column, keyOf: Seq[Column] => Column,
      skeyOf: Option[Seq[Column] => Column] = None): DataFrame = {
    val sigs = (0 until numHashes).map(sigOf)
    val bandCols = (0 until numHashes / bandSize).map { b =>
      struct(lit(b).as("b"),
        keyOf((0 until bandSize).map(j => sigs(b * bandSize + j))).as("key"))
    }
    val bandRow = skeyOf match {
      case Some(sk) => docSets.select(col("id"), sk(sigs).as("_skey"),
        explode(array(bandCols: _*)).as("_bk"))
      case None => docSets.select(col("id"), explode(array(bandCols: _*)).as("_bk"))
    }
    bandRow.select(Seq(col("id"), col("_bk.b").as("b"), col("_bk.key").as("key")) ++
      (if (skeyOf.isDefined) Seq(col("_skey")) else Nil): _*)
  }

  /** md5 band keys from doc arrays — value-identical to
    * lshBands(minhashSignatures(sh, n), bandSize). */
  def lshBandsFromArrays(docSets: DataFrame, numHashes: Int, bandSize: Int): DataFrame =
    bandsFromArrays(docSets, numHashes, bandSize,
      i => array_min(transform(col("shs"), s => md5(concat(lit(s"$i|"), s)))),
      sigs => md5(concat(sigs: _*)))

  /** xxhash64 band keys from doc arrays (fast path, not
    * oracle-portable). */
  def lshBandsFastFromArrays(docSets: DataFrame, numHashes: Int, bandSize: Int): DataFrame =
    bandsFromArrays(docSets, numHashes, bandSize,
      i => array_min(transform(col("shs"), s => xxhash64(lit(i), s))),
      sigs => xxhash64(sigs: _*))

  /** md5 band keys PLUS a per-doc signature sort key `_skey`: the first
    * 8 hex chars of every signature concatenated in hash order.
    * Near-identical docs agree on most MinHash components, so under
    * lexicographic order on `_skey` the members of a near-dup family
    * sort ADJACENT within a bucket — the sorted-neighborhood key that
    * lets `lshCandidatesCapped` generate O(n) hot-bucket candidates
    * without the min-id star's recall collapse. 8 chars/component keeps
    * the key at numHashes·8 bytes (prefix-collision odds 2^-32 per
    * component — locality-equivalent to the full 32-char strings). */
  def lshBandsFromArraysKeyed(docSets: DataFrame, numHashes: Int, bandSize: Int): DataFrame =
    bandsFromArrays(docSets, numHashes, bandSize,
      i => array_min(transform(col("shs"), s => md5(concat(lit(s"$i|"), s)))),
      sigs => md5(concat(sigs: _*)),
      Some(sigs => concat(sigs.map(s => substring(s, 1, 8)): _*)))

  /** xxhash64 twin of lshBandsFromArraysKeyed (fast path): skey from
    * zero-padded hex of the long signatures — same lexicographic
    * locality argument. */
  def lshBandsFastFromArraysKeyed(docSets: DataFrame, numHashes: Int, bandSize: Int): DataFrame =
    bandsFromArrays(docSets, numHashes, bandSize,
      i => array_min(transform(col("shs"), s => xxhash64(lit(i), s))),
      sigs => xxhash64(sigs: _*),
      Some(sigs => concat(sigs.map(s => lpad(hex(s), 16, "0")): _*)))

  /** LSH band keys: md5 of the band's signatures concatenated in
    * hash order. */
  def lshBands(signatures: DataFrame, bandSize: Int): DataFrame =
    signatures
      .withColumn("b", expr(s"CAST(i DIV $bandSize AS INT)"))
      .groupBy(col("id"), col("b"))
      .agg(collect_list(struct(col("i"), col("sig"))).as("ss"))
      .select(col("id"), col("b"),
        md5(expr("array_join(transform(array_sort(ss), x -> x.sig), '')")).as("key"))

  /** Candidate pairs: docs sharing any band bucket. Runs as the
    * uncapped case of the single-plan bucket aggregation — one shuffle
    * over the bands, pairs exploded map-side — which both reads the
    * band table ONCE (the self-join form scanned it twice) and keeps
    * the whole step lazy inside the caller's plan. Output is the
    * all-pairs candidate set, identical to the band self-join. */
  def lshCandidates(bands: DataFrame): DataFrame =
    lshCandidatesCapped(bands, Int.MaxValue)

  /** Calibration-grade bounded candidates: all-pairs WITHIN buckets of
    * size in [2, bucketCap]; buckets over the cap are DROPPED entirely
    * (not star/chain-reduced), so the retained pair spectrum stays an
    * unbiased all-pairs sample — the q167 calibration semantics, and
    * exactly mirrorable in SQL (`HAVING count(*) BETWEEN 2 AND cap`).
    * Worst-case per-bucket work is cap², independent of corpus size.
    * With `bucketCap = Int.MaxValue` the filter never binds and this
    * IS `lshCandidates`. Use `lshCandidatesCapped` where RECALL
    * matters (dedup candidate generation — star/chain keeps O(k) edges
    * into hot buckets); use this where an unbiased bounded spectrum
    * matters more than hot-bucket coverage (estimator-calibration
    * audits: a star-reduced hot bucket would skew the per-agreement
    * Jaccard distribution toward the hub doc). */
  def lshCandidatesBucketDropped(bands: DataFrame, bucketCap: Int): DataFrame = {
    require(bucketCap >= 2, "bucketCap must be >= 2")
    bands.groupBy(col("b"), col("key"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= bucketCap)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
              transform(slice(ids, i + 2, size(ids) - i - 1),
                        y -> struct(x AS id_a, y AS id_b))))""")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** Skew-safe candidate pairs for corpus scale. The bucket self-join
    * is quadratic PER BUCKET: one band bucket holding a cluster of k
    * near-identical docs (boilerplate pages, templated spam — the
    * NORM in web-scale corpora, and exactly what a dedup run exists to
    * find) emits k² pairs from a single reducer. A 1M-doc bucket is
    * 10¹² pairs — the job never finishes.
    *
    * Mitigation, two generations of it:
    *
    * - min-id STAR (every member vs the bucket's min id, O(k)) — the
    *   legacy form, used when the bands carry no sort key. Its flaw,
    *   measured by the round-6 deep-replication probe: candidates are
    *   VERIFIED by exact Jaccard downstream, and in a heterogeneous
    *   hot bucket (several distinct near-dup families co-bucketed —
    *   the norm when banding is coarse) the star's edges run from the
    *   bucket-global min to members of OTHER families, verification
    *   rejects them, and whole families lose their internal edges:
    *   16% of known near-dups escaped at 16× replication, 22% at 64×,
    *   vs 0.01% uncapped.
    *
    * - SORTED NEIGHBORHOOD (the fix, used when the bands carry a
    *   `_skey` signature sort key from `lshBandsFromArraysKeyed`):
    *   sort the bucket by (skey, id) and emit only CONSECUTIVE pairs
    *   — still O(k), but near-identical docs agree on most signature
    *   components, so a family forms a lexicographic run and its
    *   members connect in a verified chain that keep-canonical /
    *   connected-components closes transitively. Cross-family edges
    *   (the run boundaries) are rejected by verification exactly as
    *   before — they cost one wasted Jaccard each, not lost recall.
    *
    * Buckets at or under `maxBucket` keep the exact all-pairs
    * behavior (identical to lshCandidates) in both forms. Returns
    * (id_a, id_b), id_a < id_b.
    *
    * Topology inference keys on the RESERVED column `_skey`, emitted
    * only by the keyed band builders (`lshBandsFromArraysKeyed` /
    * `lshBandsFastFromArraysKeyed`) — the underscore prefix marks it
    * internal, so an unrelated user column can no longer silently
    * switch candidate topology (round-6 ADVICE). */
  def lshCandidatesCapped(bands: DataFrame, maxBucket: Int): DataFrame =
    lshCandidatesCapped(bands, maxBucket,
      sortedNeighborhood = bands.columns.contains("_skey"))

  /** Explicit-mode form: callers on the keyed band builders pass
    * `sortedNeighborhood = true` so the capped semantics are a stated
    * choice, not an inference from a column name. */
  def lshCandidatesCapped(bands: DataFrame, maxBucket: Int,
      sortedNeighborhood: Boolean): DataFrame = {
    require(!sortedNeighborhood || bands.columns.contains("_skey"),
      "sortedNeighborhood candidate generation needs the _skey column " +
        "(build bands with lshBandsFromArraysKeyed)")
    // Single-plan form: ONE shuffle (groupBy bucket) collects each
    // bucket's sorted member list, then pair generation is a map-side
    // array expression. No self-join, no window pass, no intermediate
    // to persist; the whole thing stays lazy inside the caller's
    // plan. Memory bound: one bucket's members must fit in a row —
    // ~10⁷ bare ids (80 MB) or ~10⁶ (id, skey) structs with the
    // 8·numHashes-byte sort key; the pair EXPLOSION (the actual
    // quadratic risk) is capped regardless.
    if (sortedNeighborhood) {
      val buckets = bands.groupBy(col("b"), col("key"))
        .agg(sort_array(collect_list(struct(col("_skey"), col("id")))).as("ms"))
        .filter(size(col("ms")) >= 2)
      val pairsCol = when(size(col("ms")) <= maxBucket,
        expr("""flatten(transform(ms, (x, i) ->
                transform(slice(ms, i + 2, size(ms) - i - 1),
                          y -> struct(least(x.id, y.id) AS id_a,
                                      greatest(x.id, y.id) AS id_b))))"""))
        .otherwise(expr(
          """transform(slice(ms, 1, size(ms) - 1), (x, i) ->
             struct(least(x.id, element_at(ms, i + 2).id) AS id_a,
                    greatest(x.id, element_at(ms, i + 2).id) AS id_b))"""))
      buckets.select(explode(pairsCol).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .filter(col("id_a") =!= col("id_b"))
        .distinct()
    } else {
      val buckets = bands.groupBy(col("b"), col("key"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .filter(size(col("ids")) >= 2)
      val pairsCol = when(size(col("ids")) <= maxBucket,
        expr("""flatten(transform(ids, (x, i) ->
                transform(slice(ids, i + 2, size(ids) - i - 1),
                          y -> struct(x AS id_a, y AS id_b))))"""))
        .otherwise(expr(
          "transform(slice(ids, 2, size(ids) - 1), y -> struct(element_at(ids, 1) AS id_a, y AS id_b))"))
      buckets.select(explode(pairsCol).as("p"))
        .select(col("p.id_a"), col("p.id_b"))
        .distinct()
    }
  }

  /** Production-hash MinHash signatures: xxhash64 seeded per hash
    * index — ~an order of magnitude cheaper than md5 strings (8-byte
    * longs, codegen'd hash). Same uniformity argument, NOT
    * oracle-portable (DuckDB has no xxhash64): the md5 variant stays
    * as the gate-certified path; the spec asserts both find the same
    * verified near-dup pairs. */
  def minhashSignaturesFast(shingleSets: DataFrame, numHashes: Int): DataFrame = {
    val hs = shingleSets.sparkSession.range(numHashes).select(col("id").cast("int").as("i"))
    shingleSets.crossJoin(broadcast(hs))
      .groupBy(col("id"), col("i"))
      .agg(min(xxhash64(col("i"), col("sh"))).as("sigl"))
  }

  /** LSH bands over long signatures (fast path). */
  def lshBandsFast(signatures: DataFrame, bandSize: Int): DataFrame =
    signatures
      .withColumn("b", expr(s"CAST(i DIV $bandSize AS INT)"))
      .groupBy(col("id"), col("b"))
      .agg(collect_list(struct(col("i"), col("sigl"))).as("ss"))
      .select(col("id"), col("b"),
        xxhash64(expr("transform(array_sort(ss), x -> x.sigl)")).as("key"))

  /** Fast-path MinHash+LSH dedup (xxhash64 end to end). */
  def minhashDedupFast(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2, minJaccard: Double = 0.5): DataFrame = {
    val sets = docShingleArrays(wordBigrams(docs, idCol, textCol))
      .persist(graft.GraftSession.textFrameLevel) // text-sized: shingle arrays (r15 GC audit)
    materializeAndFree(
      jaccardForCandidates(sets, lshCandidates(lshBandsFastFromArrays(sets, numHashes, bandSize)),
        minJaccard), sets)
  }

  /** Full MinHash+LSH near-dup pipeline with exact verification of
    * the candidate set: shingle → per-doc array (the one heavy
    * shuffle) → map-side band keys → bucket self-join → array-based
    * exact-Jaccard verification.
    *
    * The doc-array table is persisted (it feeds band derivation plus
    * two verification joins — without persistence Spark re-derives
    * every reference from the parquet scan); the band table is
    * consumed exactly once by the aggregated candidate step, so it
    * stays lazy. */
  def minhashDedup(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2, minJaccard: Double = 0.5): DataFrame = {
    val sets = docShingleArrays(wordBigrams(docs, idCol, textCol))
      .persist(graft.GraftSession.textFrameLevel) // text-sized: shingle arrays (r15 GC audit)
    materializeAndFree(
      jaccardForCandidates(sets, lshCandidates(lshBandsFromArrays(sets, numHashes, bandSize)),
        minJaccard), sets)
  }

  /** minhashDedup with the corpus-scale candidate cap: buckets above
    * `maxBucket` contribute sorted-neighborhood consecutive pairs
    * (O(k), see lshCandidatesCapped) instead of a clique (O(k²)).
    * Below the cap the output is IDENTICAL to minhashDedup — which is
    * what lets the composed pipeline (CorpusPipeline) run this exact
    * code under the DuckDB oracle at gate scale while being the plan
    * you'd ship at 100 TB. */
  def minhashDedupCapped(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2, minJaccard: Double = 0.5,
      maxBucket: Int = 10000): DataFrame = {
    val sets = docShingleArrays(wordBigrams(docs, idCol, textCol))
      .persist(graft.GraftSession.textFrameLevel) // text-sized: shingle arrays (r15 GC audit)
    materializeAndFree(
      jaccardForCandidates(sets,
        lshCandidatesCapped(lshBandsFromArraysKeyed(sets, numHashes, bandSize), maxBucket,
          sortedNeighborhood = true),
        minJaccard), sets)
  }

  /** N-bit SimHash per document (Charikar): md5 hex digit j ≥ '8'
    * votes +1 for bit j else −1 per token occurrence; bit = vote>0.
    * bits ≤ 32 uses md5(tok) digit j+1 for bit j (the oracle-portable
    * construction, output-identical to round 2); bits 33..64 extend
    * with a second hash md5('2|'||tok) — wider fingerprints are the
    * scale path (see simhashNearDupsCapped).
    *
    * Vote aggregation is PACKED: per token the nibble high bits are
    * decoded with ceil(bits/15) conv() calls (instead of one
    * substring+ascii per bit) and packed 3 counters per long, 20 bits
    * per lane, so the group-by sums ceil(bits/3) longs instead of
    * carrying `bits` separate sum(CASE) slots — the 32-wide agg row
    * was the round-2 q32/q44 hot spot. Positive-vote counts come back
    * out with lane shifts after the agg; bit j is set iff
    * 2*pos_j > n_tokens, identical to the per-bit ±1 vote sum
    * (pos − neg = 2*pos − n). Lane width bounds docs at 2^20 tokens
    * (≈6 MB of text); the corpus pipeline's length filters run
    * upstream of any simhash at scale. */
  def simhashBits(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
    val toks = docs
      .select(col(idCol).as("id"), explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("th",
        if (bits <= 32) md5(col("tok"))
        else concat(md5(col("tok")), md5(concat(lit("2|"), col("tok")))))
    // Decode the hex in ≤15-digit windows (60 bits — fits a signed
    // long through conv) and mask out each nibble's high bit.
    val decoded = (0 until bits by 15).map { st =>
      val len = math.min(15, bits - st)
      (st, len, conv(substring(col("th"), st + 1, len), 16, 10).cast("long"))
    }
    def bitCol(j: Int): Column = {
      val (st, len, c) = decoded.find { case (s0, l, _) => j >= s0 && j < s0 + l }.get
      shiftright(c, 4 * (len - 1 - (j - st)) + 3).bitwiseAND(lit(1L))
    }
    packedVoteSimhash(toks, bits, bitCol)
  }

  /** Production-hash SimHash: per-token bit votes come from ONE
    * codegen'd xxhash64 long (bit j = bit 63−j of xxhash64(tok))
    * instead of md5 hex strings decoded through conv — the md5 cost
    * was profiled as q44's floor (round-2 note), and this removes it
    * while keeping the identical packed-lane vote aggregation. Same
    * uniformity argument as the md5 construction; NOT oracle-portable
    * (DuckDB has no xxhash64), so the md5 path stays the gate-certified
    * form and DedupSimilaritySpec asserts both find the same verified
    * near-dup pair set on a planted corpus. */
  def simhashBitsFast(docs: DataFrame, idCol: String, textCol: String, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 64, "bits must be in [1, 64]")
    val toks = docs
      .select(col(idCol).as("id"), explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .withColumn("xh", xxhash64(col("tok")))
    packedVoteSimhash(toks, bits,
      j => shiftright(col("xh"), 63 - j).bitwiseAND(lit(1L)))
  }

  /** Shared vote-aggregation scaffolding of the simhash family: pack
    * 3 per-bit votes per long (20-bit lanes), one groupBy summing
    * ceil(bits/3) longs, lane-overflow guard, bit = 2*pos > n. `toks`
    * is (id, <hash cols>); `bitCol(j)` extracts token j's vote from
    * them. */
  private def packedVoteSimhash(toks: DataFrame, bits: Int,
      bitCol: Int => Column): DataFrame = {
    val laneBits = 20
    val lanes = 3
    val packed = (0 until bits).grouped(lanes).toSeq.zipWithIndex.map { case (g, i) =>
      g.zipWithIndex.map { case (j, s) => shiftleft(bitCol(j), laneBits * s) }
        .reduce(_ + _).as(s"p$i")
    }
    val agg = toks
      .select(col("id") +: packed: _*)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n"),
        packed.indices.map(i => sum(col(s"p$i")).as(s"p$i")): _*)
    // Lane-overflow guard: a doc at ≥ 2^20 tokens would silently
    // corrupt neighboring vote lanes. assert_true returns null when
    // the predicate holds, so routing it through `n` (which every bit
    // comparison reads) keeps the check in the plan at ~zero cost and
    // makes an oversized doc fail LOUDLY instead of fingerprinting
    // wrong.
    val nGuarded = col("n") + coalesce(
      assert_true(col("n") < (1L << laneBits),
        concat(lit(s"simhashBits: doc "), col("id"),
          lit(s" has "), col("n"),
          lit(s" tokens (>= 2^$laneBits) — packed vote lanes would overflow"))).cast("long"),
      lit(0L))
    val bitChars = (0 until bits).map { j =>
      val pos = shiftright(col(s"p${j / lanes}"), laneBits * (j % lanes))
        .bitwiseAND(lit((1L << laneBits) - 1))
      when(pos * 2 > nGuarded, "1").otherwise("0")
    }
    agg.select(col("id"), concat(bitChars: _*).as("simhash"))
  }

  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashBits(docs, idCol, textCol, 16)

  /** SimHash near-dup pairs via MULTI-INDEX Hamming search (Manku,
    * Jarvelin, Sarma, "Detecting Near-Duplicates for Web Crawling",
    * WWW 2007): a pair within Hamming distance m over 4 bands differs
    * in at most m bands, so it agrees EXACTLY on every band outside
    * some size-m subset — join on one key per size-m band subset,
    * with the subset's bands masked out of the fingerprint. Recall is
    * complete by pigeonhole; exact bit_count(xor) then filters to the
    * true distance, so the output pair set is IDENTICAL to the
    * oracle's single-band construction — but the candidate keyspace
    * is (4−m)·bits/4 wide instead of bits/4. At sf0.1 / 32 bits /
    * m=1 that is 24-bit keys vs 8-bit: 91k candidate pairs instead of
    * 7.5M (82×), and at corpus scale it is the difference between
    * quadratic blowup in every 256th-of-the-corpus bucket and buckets
    * that only hold genuinely similar fingerprints. m=3 degenerates
    * to the classic any-shared-band join (C(4,3)=4 keys of one band
    * each) — this is a strict generalization.
    *
    * The pairing phase runs on PACKED LONGS, not the oracle's bit
    * strings: fingerprint → one long (conv base-2; 64-bit wraps to
    * negative, which bitwise ops don't care about), combo key → the
    * long with the excluded bands zeroed, hamming → native
    * bit_count(xor). Rows are fixed-width (id, hl, b, key) —
    * Tungsten hashes them several times faster than 32-char strings. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 32, maxHamming: Int = 1): DataFrame = {
    val sh = simhashBits(docs, idCol, textCol, bits)
    // conv returns a DECIMAL STRING; above 63 bits it exceeds the
    // signed-long cast range, so wide fingerprints parse as two 32-bit
    // halves OR'd together (two's-complement wrap is fine — only
    // bitwise ops touch hl).
    val hlCol =
      if (bits <= 32) conv(col("simhash"), 2, 10).cast("long")
      else shiftleft(conv(substring(col("simhash"), 1, bits - 32), 2, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(col("simhash"), bits - 31, 32), 2, 10).cast("long"))
    hammingNearDupsPacked(sh.select(col("id"), hlCol.as("hl")), bits, maxHamming)
  }

  /** The multi-index Hamming pairing itself, over ANY packed-long
    * fingerprint table (id, hl) — the fingerprint source is
    * pluggable: text SimHash above, perceptual image dHash
    * ([[imageNearDups]]). Semantics and plan shape exactly as
    * documented on [[simhashNearDups]]. */
  def hammingNearDupsPacked(shl: DataFrame, bits: Int, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "multi-index over 4 bands needs maxHamming in [0, 3]")
    require(bits % 4 == 0 && bits <= 64, "bits must be a multiple of 4, at most 64")
    val bandBits = bits / 4
    // One key per size-maxHamming subset of bands (max(m,1): m=0 still
    // needs one full-fingerprint key): key = hl with the subset's
    // bands masked to zero, tagged by the subset's index.
    val comboMasks = (0 until 4).combinations(math.max(maxHamming, 1)).map { excluded =>
      excluded.map(c => ((1L << bandBits) - 1) << ((3 - c) * bandBits)).reduce(_ | _)
    }.toSeq
    val combos = comboMasks.zipWithIndex.map { case (m, i) =>
      struct(lit(i).as("b"), col("hl").bitwiseAND(lit(~m)).as("key"))
    }
    val bands = shl.select(col("id"), col("hl"), explode(array(combos: _*)).as("_c"))
      .select(col("id"), col("hl"), col("_c.b").as("b"), col("_c.key").as("key"))
    // Pair generation is the single-plan bucket aggregation (as in
    // lshCandidatesCapped, carrying hl so the Hamming test runs INSIDE
    // the per-bucket array transform): one shuffle collects each
    // bucket's sorted (id, hl) members, pairs that fail the distance
    // test are dropped before they are ever exploded into rows, and
    // survivors (output-sized) pay the one distinct. The whole
    // operator is one lazy two-shuffle plan — no persist, no
    // checkpoint, no self-join. Per-bucket work is quadratic in bucket
    // size, which multi-index keys keep small for FALSE candidates;
    // buckets of genuinely near-identical docs are output-sized by
    // definition, and a duplicate-heavy corpus where even that
    // explodes is what the capped scale variant
    // (simhashNearDupsCapped) is for.
    val buckets = bands.groupBy(col("b"), col("key"))
      .agg(sort_array(collect_list(struct(col("id"), col("hl")))).as("ms"))
      .filter(size(col("ms")) >= 2)
    // Hamming test BEFORE the struct build (round-16, guide §1.2 step
    // 2 — per-task work): most bucket co-occupants fail the distance
    // test, and the previous form allocated a 3-field struct per
    // CANDIDATE before filtering; testing bit_count first means only
    // OUTPUT pairs ever construct a struct. Same pairs, same order.
    val pairsCol = expr(
      s"""flatten(transform(ms, (x, i) ->
            transform(filter(slice(ms, i + 2, size(ms) - i - 1),
                      y -> bit_count(x.hl ^ y.hl) <= $maxHamming),
                    y -> struct(x.id AS id_a, y.id AS id_b,
                                bit_count(x.hl ^ y.hl) AS hamming))))""")
    buckets.select(explode(pairsCol).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .distinct()
  }

  /** Perceptual image near-dup pairs (round-14, VERDICT r13 item 5):
    * 64-bit dHash over DECODED pixels (any of the four real codecs —
    * BMP/GIF/PNG/JPEG) through the identical multi-index banded
    * Hamming machinery as text SimHash. This is the operator that
    * catches what exact dedup structurally cannot: the same image
    * re-encoded in another format or nearest-resized shares not one
    * payload byte with its original, but hashes within `maxHamming`.
    * Scale shape is [[simhashNearDups]]'s: fingerprints are one long
    * per image (the image BYTES never shuffle — decode is map-side),
    * candidates are bucket-bounded, output pays the one distinct. */
  def imageNearDups(media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3): DataFrame =
    hammingNearDupsPacked(Multimodal.imageDHashes(media), 64, maxHamming)

  /** Perceptual AUDIO near-dup pairs (round-15, VERDICT r14 item 3):
    * 64-bit windowed-energy delta hash over DECODED channel-0 PCM
    * (WAV or FLAC — both real codecs) through the identical
    * multi-index banded Hamming machinery as text SimHash and image
    * dHash. Catches what exact dedup cannot: the same clip
    * losslessly re-encoded WAV↔FLAC, volume-scaled, or
    * nearest-resampled shares no payload bytes with its original but
    * hashes within `maxHamming`. Scale shape identical to
    * [[imageNearDups]]: one long per clip, decode map-side, audio
    * bytes never shuffle, candidates bucket-bounded. */
  def audioNearDups(media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3): DataFrame =
    hammingNearDupsPacked(Multimodal.audioFingerprints(media), 64, maxHamming)

  /** Bucket-capped audio near-dups — the production default at scale:
    * real audio corpora contain LOW-ENTROPY fingerprint families
    * (digital silence hashes to 0 everywhere; constant tones collapse
    * bands), and an uncapped band bucket is quadratic in the family
    * size. Below the cap the output is IDENTICAL to [[audioNearDups]]
    * (spec-pinned); above it, oversized buckets contribute
    * fingerprint-order chain pairs (Manku sorted-table probe), which
    * keeps each family connected for dedupCorpus. */
  def audioNearDupsCapped(media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3, maxBucket: Int = 256): DataFrame =
    hammingNearDupsPackedCapped(Multimodal.audioFingerprints(media), 64,
      maxHamming, maxBucket)

  /** Scale-path SimHash near-dups: 64-bit fingerprints in 4×16-bit
    * bands — 2^16 band keyspace instead of the 32-bit form's 2^8, so
    * at corpus scale the expected bucket population drops ~256× —
    * PLUS capping on whatever oversized
    * buckets remain (the 32-bit form's uncapped bucket self-join was
    * quadratic per bucket — the round-2 scale-killer). Candidates are
    * then exact-Hamming-filtered, so precision is unchanged; capped
    * buckets generate consecutive pairs in FINGERPRINT order (Manku
    * WWW'07's sorted-table probe: Hamming-close fingerprints agree on
    * high bits, so they sort adjacent), which chains each near-dup
    * family for dedupCorpus instead of the old min-id star whose
    * cross-family edges the Hamming filter killed (semantics spec'd in
    * DedupSimilaritySpec). */
  def simhashNearDupsCapped(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 64, maxHamming: Int = 3, maxBucket: Int = 256,
      fast: Boolean = false): DataFrame = {
    require(bits % 4 == 0 && bits <= 64, "bits must be a multiple of 4, at most 64")
    require(maxHamming <= 3, "4-band pigeonhole only guarantees recall for maxHamming <= 3")
    val bandBits = bits / 4
    // fast = xxhash64 token votes (production; ~10× cheaper per token),
    // default = the md5 construction the DuckDB oracle certifies.
    val sh = if (fast) simhashBitsFast(docs, idCol, textCol, bits)
             else simhashBits(docs, idCol, textCol, bits)
    // ONE lazy two-shuffle plan, like simhashNearDups: the packed-long
    // fingerprint rides INTO the bucket aggregation, so the Hamming
    // test runs inside the per-bucket array transform and nothing
    // joins back afterward. (The previous form persisted the
    // fingerprints, joined candidates back to them twice, and eagerly
    // checkpointed the result — three extra job rounds that at bench
    // scale cost more than the whole computation: 2.2s → this plan's
    // ~0.6s, and at corpus scale two corpus-keyed shuffles are gone.)
    val hlCol =
      if (bits <= 32) conv(col("simhash"), 2, 10).cast("long")
      else shiftleft(conv(substring(col("simhash"), 1, bits - 32), 2, 10).cast("long"), 32)
        .bitwiseOR(conv(substring(col("simhash"), bits - 31, 32), 2, 10).cast("long"))
    hammingNearDupsPackedCapped(sh.select(col("id"), hlCol.as("hl")),
      bits, maxHamming, maxBucket)
  }

  /** The capped multi-index Hamming pairing itself, over ANY packed-
    * long fingerprint table (id, hl) — the bucket-capped scale twin of
    * [[hammingNearDupsPacked]], factored out of simhashNearDupsCapped
    * (round-15) so non-text fingerprint sources get the same 100 TB
    * path: a LOW-ENTROPY fingerprint population (digital silence in
    * audio, flat images) lands whole families in one band bucket, and
    * without the cap the per-bucket pair transform is quadratic in
    * that family. Same recall guarantee (4-band pigeonhole, Hamming
    * ≤ 3) and the same Manku sorted-table probe above the cap. */
  def hammingNearDupsPackedCapped(shl: DataFrame, bits: Int,
      maxHamming: Int, maxBucket: Int): DataFrame = {
    require(bits % 4 == 0 && bits <= 64, "bits must be a multiple of 4, at most 64")
    require(maxHamming <= 3, "4-band pigeonhole only guarantees recall for maxHamming <= 3")
    val bandBits = bits / 4
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("b"),
        shiftright(col("hl"), (3 - b) * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("key"))
    }
    val bands = shl.select(col("id"), col("hl"))
      .select(col("id"), col("hl"), explode(array(bandCols: _*)).as("_bk"))
      .select(col("id"), col("hl"), col("_bk.b").as("b"), col("_bk.key").as("key"))
    // Members sort by (hl, id) — FINGERPRINT order — so the capped
    // branch's consecutive pairs realize Manku's sorted-table probe.
    val buckets = bands.groupBy(col("b"), col("key"))
      .agg(sort_array(collect_list(struct(col("hl"), col("id")))).as("ms"))
      .filter(size(col("ms")) >= 2)
    // Under the cap: all pairs, Hamming-filtered before exploding
    // (id_a/id_b normalized — fingerprint order is not id order).
    // Above it: consecutive-in-fingerprint-order pairs, same filter.
    // distance test before the struct build — see hammingNearDupsPacked
    val fullPairs = expr(
      s"""flatten(transform(ms, (x, i) ->
            transform(filter(slice(ms, i + 2, size(ms) - i - 1),
                      y -> bit_count(x.hl ^ y.hl) <= $maxHamming),
                    y -> struct(least(x.id, y.id) AS id_a,
                                greatest(x.id, y.id) AS id_b,
                                bit_count(x.hl ^ y.hl) AS hamming))))""")
    val chainPairs = expr(
      s"""filter(transform(slice(ms, 1, size(ms) - 1), (x, i) ->
               struct(least(x.id, element_at(ms, i + 2).id) AS id_a,
                      greatest(x.id, element_at(ms, i + 2).id) AS id_b,
                      bit_count(x.hl ^ element_at(ms, i + 2).hl) AS hamming)),
             p -> p.hamming <= $maxHamming)""")
    buckets
      .select(explode(when(size(col("ms")) <= maxBucket, fullPairs)
        .otherwise(chainPairs)).as("p"))
      .select(col("p.id_a"), col("p.id_b"), col("p.hamming"))
      .distinct()
  }

  /** Connected components over an undirected near-dup pair set.
    * Returns (id, comp) with comp = the component's min id — only ids
    * that appear in a pair are present.
    *
    * `pairs` is the POST-VERIFICATION pair list — O(actual
    * duplicates), tiny next to the corpus — so the default path
    * collects it and runs union-find on the driver (a 10M-pair list is
    * ~160 MB of longs; one pass, no Spark jobs). Above
    * `maxDriverPairs` it falls back to distributed min-label
    * propagation WITH pointer jumping (each round also adopts the
    * label OF the current label), so the round count is
    * O(log diameter) — which matters now that sorted-neighborhood
    * candidate generation (lshCandidatesCapped) connects hot-bucket
    * families as linear CHAINS rather than depth-1 stars. Each round
    * localCheckpoints — lineage would otherwise double per iteration —
    * and convergence is read off a `chg` flag carried IN the
    * checkpointed frame (a scan, not a join against the previous
    * round). Both paths are spec'd equal (DedupSimilaritySpec).
    *
    * Why 8M is the default, with data (docs/CC_CROSSOVER_r10.jsonl,
    * measured on this box at local[32]): the driver union-find still
    * wins at every probed size — 1M pairs 6.0s vs 32.0s, 8M 71.1s vs
    * 96.4s, 16M 211.3s vs 397.3s — so the threshold is NOT a speed
    * crossover; it is a driver-MEMORY bound. 8M collected Rows of two
    * boxed ids measure ~1.3 GB transient on a 16 GB driver heap
    * (Rows + the union-find HashMap at ~21M nodes), which leaves the
    * collect safe under default memory; 16M doubles that and starts
    * competing with result-serving allocations. Raise it only with a
    * bigger driver heap — the cost of guessing low is a slower (but
    * correct) distributed round, the cost of guessing high is an OOM
    * on the driver. */
  def connectedComponents(pairs: DataFrame, maxDriverPairs: Long = 8L * 1000 * 1000): DataFrame = {
    val idType = pairs.schema("id_a").dataType
    val edgesRaw = pairs.select(col("id_a"), col("id_b"))
    // ONE capped collect doubles as the size probe: if the limit+1
    // rows all arrived under the cap, they ARE the complete pair list
    // — the previous separate count() probe evaluated the (often
    // expensive) pair plan twice per dedup query.
    val probe = edgesRaw.limit((maxDriverPairs + 1).toInt).collect()
    if (probe.length <= maxDriverPairs)
      componentsOnDriver(probe, edgesRaw.sparkSession, idType)
    else componentsByPropagation(edgesRaw)
  }

  /** Driver union-find (union-by-min + path compression) over a
    * collected pair list; result re-distributed as a DataFrame.
    * Ids are whatever the pair columns carry — every Spark atomic id
    * type boxes to a Comparable, which supplies the min. */
  private def componentsOnDriver(collected: Array[org.apache.spark.sql.Row],
      spark: SparkSession,
      idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import scala.collection.mutable
    val ord: Ordering[Any] = (a: Any, b: Any) =>
      a.asInstanceOf[Comparable[Any]].compareTo(b)
    val parent = mutable.HashMap.empty[Any, Any]
    // Iterative find + full path compression: union-by-min (unlike
    // union-by-rank) can build deep chains, and a recursive find would
    // blow the stack at millions of pairs.
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    collected.foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("comp", idType)))
    val rows = parent.keys.toSeq.map(id =>
      org.apache.spark.sql.Row(id, find(id)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Distributed fallback: iterative min-label propagation plus
    * pointer jumping (comp := min(comp, comp(comp)) each round), which
    * collapses chain components in O(log diameter) rounds — the extra
    * self-join per round is over the label frame (node-sized), cheap
    * next to saving diameter−log(diameter) full rounds on chains. */
  private def componentsByPropagation(pairs: DataFrame): DataFrame = {
    val edges = graft.PlanCapture.checkpoint(
      pairs.select(col("id_a").as("s"), col("id_b").as("d"))
        .unionByName(pairs.select(col("id_b").as("s"), col("id_a").as("d")))
        .distinct(), "cc-edges")
    var labels = graft.PlanCapture.checkpoint(
      edges.select(col("s").as("id")).distinct()
        .select(col("id"), col("id").as("comp")), "cc-labels-init")
    var done = false
    while (!done) {
      val viaNeighbor = edges.join(labels, edges("d") === labels("id"))
        .groupBy(col("s")).agg(min(col("comp")).as("ncomp"))
      val stepped = labels.join(viaNeighbor, labels("id") === viaNeighbor("s"), "left")
        .select(labels("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("mid"))
      // Jump against the PREVIOUS round's checkpointed labels (one
      // round stale but labels only ever decrease, so any adopted
      // label is still reachable-and-smaller) — jumping against
      // `stepped` itself would recompute the propagation join twice.
      val jump = labels.select(col("id").as("_jid"), col("comp").as("_jcomp"))
      val next = graft.PlanCapture.checkpoint(
        stepped.join(jump, stepped("mid") === jump("_jid"), "left")
          .select(stepped("id"),
            least(col("mid"), coalesce(col("_jcomp"), col("mid"))).as("comp"),
            (least(col("mid"), coalesce(col("_jcomp"), col("mid"))) < col("old")).as("chg")),
        "cc-round")
      done = next.filter(col("chg")).isEmpty
      labels = next.select(col("id"), col("comp"))
    }
    labels
  }

  /** Keep-canonical decision table: every doc mapped to its
    * component's min id (itself when unpaired). Survivors of the
    * dedup are exactly the rows where the two columns agree; the
    * corpus-sized side is one left join against the tiny component
    * map (AQE broadcasts it), so the whole collapse costs one
    * map-side pass over the corpus. */
  def canonicalMap(docs: DataFrame, idCol: String, pairs: DataFrame,
      maxDriverPairs: Long = 8L * 1000 * 1000): DataFrame =
    docs.select(col(idCol))
      // explicit broadcast: the driver-built component map has no
      // catalog stats, so without the hint Spark assumes it's big and
      // plans a sort-merge join of the whole corpus against it.
      .join(broadcast(connectedComponents(pairs, maxDriverPairs)
          .withColumnRenamed("id", idCol)),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("comp"), col(idCol)).as("canonical_id"))

  /** The deduplicated corpus: one representative (min id) per near-dup
    * component plus every unpaired doc — the final stage of the
    * pair → component → collapse pipeline (the training-data dedup
    * OUTPUT, not just the pair report). */
  def dedupCorpus(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("comp") =!= col("id")).select(col("id").as(idCol))
    docs.join(broadcast(drop), Seq(idCol), "left_anti")
  }

  // ---- Incremental (delta) dedup: the standing-corpus shape ----

  /** Compact MinHash band-key index of a corpus: (id, b, key), the
    * table a production pipeline PERSISTS alongside the corpus. At
    * 100 TB the index is what makes dedup incremental — a new crawl
    * is shingled once and joined against these ~tens of bytes per
    * document; the standing corpus text is never re-read, let alone
    * re-shingled. Persist partitioned/bucketed by `key` so the delta
    * join co-locates. md5 construction = the oracle-certified q31
    * banding (use lshBandsFastFromArrays for the xxhash64 production
    * twin). */
  def minhashIndex(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bandSize: Int = 2): DataFrame =
    lshBandsFromArrays(docShingleArrays(wordBigrams(docs, idCol, textCol)),
      numHashes, bandSize)

  /** Dedup a NEW batch against a standing corpus without reprocessing
    * the corpus — the per-crawl production operation. Every delta doc
    * is classified:
    *
    *   - `dup_of_base`: verified near-dup (exact Jaccard ≥
    *     `minJaccard`) of some base doc — the base copy wins, the
    *     delta copy is dropped;
    *   - `dup_in_delta`: not matched to base, but a non-canonical
    *     member (id ≠ component min) of a within-delta near-dup
    *     component — precedence is dup_of_base first, and components
    *     are computed over ALL verified delta pairs, so a component
    *     whose min id matched base still collapses to that min
    *     (both rows drop: the base copy is the canonical survivor);
    *   - `kept`: the batch's surviving documents.
    *
    * Dataflow: delta is shingled once (one groupBy shuffle — the
    * delta's size, not the corpus's); band keys derive map-side; the
    * cross join touches only (b, key) index rows; and base shingle
    * sets for VERIFICATION are built from candidate base ids only — a
    * broadcast semi-join prunes the base scan to the handful of docs
    * LSH actually flagged. Within-delta pairs reuse the
    * sorted-neighborhood-capped candidate path. Pass `baseIndex` with the persisted index table
    * in production; omitting it derives the index from `base` (what
    * the gate certifies). */
  def deltaDedupStatus(base: DataFrame, delta: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 8, bandSize: Int = 2,
      minJaccard: Double = 0.5, maxBucket: Int = 10000,
      baseIndex: Option[DataFrame] = None): DataFrame = {
    // Delta-side shingle arrays and bands each feed ≥2 consumers —
    // persist both, release via materializeAndFree on the way out.
    // DISK_ONLY (round-14, mirroring the q69 recipe fix): the shingle
    // arrays are a full text-sized copy of the delta, and with a
    // derived base index THREE such frames are simultaneously live —
    // on heap that was 10× GC amplification in a long-lived JVM
    // (q70's 36 s driver vs 3.3 s local signature); on disk they cost
    // one serialized write each and the heap stays for shuffles.
    // Keyed bands: the extra skey column rides along unused through the
    // index join (which selects b/key/id) and gives the within-delta
    // capped candidate path sorted-neighborhood semantics.
    val dSets = docShingleArrays(wordBigrams(delta, idCol, textCol))
      .persist(graft.GraftSession.textFrameLevel)
    val dBands = lshBandsFromArraysKeyed(dSets, numHashes, bandSize)
      .persist(graft.GraftSession.textFrameLevel)
    // With a PROVIDED index (production), the base corpus is scanned
    // only for verification, pruned to candidate ids. Without one
    // (the gate form), shingle the base ONCE and derive both the
    // index and the verification sets from the persisted arrays —
    // re-shingling for verification doubled this operator's cost.
    val derivedBSets = if (baseIndex.isEmpty)
      Some(docShingleArrays(wordBigrams(base, idCol, textCol))
        .persist(graft.GraftSession.textFrameLevel))
    else None
    val bIdx = baseIndex.getOrElse(
      lshBandsFromArrays(derivedBSets.get, numHashes, bandSize))

    // Candidates vs base: delta docs sharing any band bucket with the
    // index. Only (id, b, key) rows move — never text.
    val crossCand = dBands.select(col("b"), col("key"), col("id").as("id_d"))
      .join(bIdx.select(col("b"), col("key"), col("id").as("id_base")), Seq("b", "key"))
      .select(col("id_d"), col("id_base")).distinct()

    // Exact-Jaccard verification against base, with base shingle sets
    // built ONLY for flagged ids (left-semi prunes the corpus scan).
    val candIds = crossCand.select(col("id_base").as("id")).distinct()
    val bSets = derivedBSets match {
      case Some(bs) => bs.join(broadcast(candIds), Seq("id"), "left_semi")
      case None => docShingleArrays(wordBigrams(
        base.join(broadcast(candIds.withColumnRenamed("id", idCol)),
          Seq(idCol), "left_semi"), idCol, textCol))
    }
    val dupOfBase = crossCand
      .join(dSets.select(col("id").as("id_d"), col("shs").as("shs_d")), "id_d")
      .join(bSets.select(col("id").as("id_base"), col("shs").as("shs_b")), "id_base")
      .select(col("id_d"),
        size(array_intersect(col("shs_d"), col("shs_b"))).cast("long").as("inter"),
        size(col("shs_d")).cast("long").as("sz_d"),
        size(col("shs_b")).cast("long").as("sz_b"))
      .filter(col("inter") / (col("sz_d") + col("sz_b") - col("inter")) >= minJaccard)
      .select(col("id_d")).distinct()

    // Within-delta near-dup components → non-canonical members.
    val withinPairs = jaccardForCandidates(dSets,
      lshCandidatesCapped(dBands, maxBucket, sortedNeighborhood = true), minJaccard)
    val losers = connectedComponents(withinPairs)
      .filter(col("comp") =!= col("id")).select(col("id"))

    // Both dup lists are O(actual duplicates) — broadcast them; the
    // delta-sized side is two map-side left joins.
    val out = delta.select(col(idCol))
      .join(broadcast(dupOfBase.select(col("id_d").as(idCol), lit(1).as("_mb"))),
        Seq(idCol), "left")
      .join(broadcast(losers.select(col("id").as(idCol), lit(1).as("_ml"))),
        Seq(idCol), "left")
      .select(col(idCol),
        when(col("_mb") === 1, lit("dup_of_base"))
          .when(col("_ml") === 1, lit("dup_in_delta"))
          .otherwise(lit("kept")).as("status"))
    materializeAndFree(out, Seq(dSets, dBands) ++ derivedBSets: _*)
  }
}
