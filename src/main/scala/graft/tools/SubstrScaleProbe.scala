package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.TextAnalysis

/** Scaling probe for duplicate-substring removal (q101/q104 family):
  * replicate the sf corpus m× where replica i of a doc is one unique
  * prefix token + the doc's full text — the verbatim-re-crawl case
  * ExactSubstr targets. Expected semantics are exactly computable:
  * the original (smallest id) keeps its text untouched, and every
  * replica of a ≥k-token doc collapses to exactly its 1-token prefix
  * (the prefix window is unique; every pure-tail window is a loser
  * and covers all tail tokens). The probe asserts BOTH invariants at
  * every depth and measures docs/s for the two loser-join modes:
  *
  *   - broadcast (the default; right at typical 1–10% duplication) —
  *     at depth d the loser list is ~(d−1)/d of all windows, i.e.
  *     corpus-sized, so this mode is expected to degrade or die at
  *     deep replication;
  *   - shuffle (broadcastLosers=false; the corpus moves once on id) —
  *     the mode a depth-d re-crawl must run with.
  *
  * Emits one JSON line per (depth, mode): docs, losers, wall seconds,
  * docs/s, invariant booleans — append to docs/SUBSTR_PROBE_r7.jsonl.
  *
  * Usage: runMain graft.tools.SubstrScaleProbe [sfDir] [depth...]
  */
object SubstrScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val depths =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16, 64)
    val k = 8
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      "substr-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // replicate only ≥k-token docs so the per-replica expectation is exact
    val base = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(graft.functions.TextFunctions.tokenCount(col("text")) >= k)
      .localCheckpoint(true)
    val nBase = base.count()
    val baseOut = TextAnalysis.substringDedup(base, "doc_id", "text", k)
      .select(col("doc_id"), md5(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    depths.foreach { m =>
      val corpus = (0 until m).map { i =>
        if (i == 0) base
        else base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          concat(lit(s"zrep${i}u"), col("doc_id"), lit(" "), col("text")).as("text"))
      }.reduce(_ unionByName _).repartition(32).localCheckpoint(true)
      val nDocs = corpus.count()
      Seq(true, false).foreach { bcast =>
        if (!(bcast && m >= 64)) { // corpus-sized broadcast: excluded by design, noted in the artifact
          val t0 = System.nanoTime()
          val out = TextAnalysis.substringDedup(corpus, "doc_id", "text", k,
              broadcastLosers = bcast)
            .select(col("doc_id"), col("n_kept"), md5(col("text")).as("h"))
            .localCheckpoint(true)
          val wall = (System.nanoTime() - t0) / 1e9
          val origRows = out.filter(col("doc_id") < 10000000L)
            .collect().map(r => (r.getLong(0), r.getString(2))).toMap
          val origInvariant = origRows == baseOut
          val badReplicas = out.filter(col("doc_id") >= 10000000L)
            .filter(col("n_kept") =!= 1L).count()
          val nRep = out.filter(col("doc_id") >= 10000000L).count()
          // every replica survives as exactly its unique prefix token —
          // even replicas of fully-removed originals
          val repExpected = nBase * (m - 1)
          println(s"""{"probe":"substr","depth":$m,"mode":"${if (bcast) "broadcast" else "shuffle"}","docs":$nDocs,""" +
            s""""wall_s":${f"$wall%.2f"},"docs_per_s":${f"${nDocs / wall}%.0f"},""" +
            s""""orig_invariant":$origInvariant,"replicas_kept":$nRep,""" +
            s""""replicas_expected":$repExpected,"bad_replicas":$badReplicas}""")
          assert(origInvariant, s"depth=$m mode=$bcast: original outputs changed")
          assert(badReplicas == 0, s"depth=$m mode=$bcast: $badReplicas replicas kept ≠ 1 token")
          assert(nRep == repExpected, s"depth=$m mode=$bcast: replica count $nRep != $repExpected")
        }
      }
    }
    spark.stop()
  }
}
