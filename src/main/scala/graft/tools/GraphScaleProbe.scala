package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.FeedShapes

/** Scaling probe for the iterative graph ops (q146 LPA / q158 k-core
  * / q193 HITS): replicate the deterministic customer graph m× as DISJOINT
  * isomorphic copies (replica i shifts every node id by i·Shift,
  * where Shift is the next power of ten above the max node id), run
  * the scale-safe SHUFFLE path (broadcast*=false — the 100 TB
  * default), and report wall time per scale plus the correctness
  * invariant: replica 0's labels / core membership must equal the
  * scale-1 result EXACTLY (disjoint copies can't interact, and
  * min-id-based labels are shift-invariant within a replica), so a
  * growing graph can never change what the algorithm says about the
  * subgraph it already knew.
  *
  * Usage: runMain graft.tools.GraphScaleProbe [sfDir] [scale...]
  */
object GraphScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val scales =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 16)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graph-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("u"))
    // replica shift: the next power of ten ABOVE the max node id, so
    // replicas stay disjoint at ANY scale-factor dir (a fixed 1e7
    // would overlap once c_custkey reaches 1e7, ~sf 67, and silently
    // mis-slice the invariance check)
    val maxKey = base.agg(max(col("u"))).head().getLong(0)
    val Shift = Iterator.iterate(10000000L)(_ * 10).dropWhile(_ <= maxKey).next()
    // the q158 mixed-degree edge recipe (leaves + hubs, so the peel
    // and the vote structure are both non-trivial)
    def edgesOf(nodes: DataFrame): DataFrame = nodes
      .select(col("u"), (col("u") % 211).as("v"))
      .unionByName(nodes.select(col("u"), ((col("u") * 7 + 3) % 211).as("v")))
      .unionByName(nodes.filter(col("u") % 3 === 0)
        .select(col("u"), ((col("u") * 13 + 5) % 431).as("v")))
      .filter(col("u") =!= col("v"))

    var lpaBase: Map[Long, Long] = Map.empty
    var coreBase: Map[Long, Long] = Map.empty
    var hitsBase: Map[Long, Long] = Map.empty
    scales.foreach { m =>
      // replica i = base graph with BOTH endpoints shifted i·Shift:
      // isomorphic, disjoint (hub ids 0..430 shift too)
      val e0 = edgesOf(base)
      val edges = (0 until m).map { i =>
        if (i == 0) e0
        else e0.select((col("u") + lit(i * Shift)).as("u"),
          (col("v") + lit(i * Shift)).as("v"))
      }.reduce(_ unionByName _).repartition(32).localCheckpoint(true)
      val nEdges = edges.count()

      def timed(f: => Map[Long, Long]): (Map[Long, Long], Double) = {
        f // warm-up (codegen/JIT — the Bench convention)
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      def baseSlice(r: Map[Long, Long]): Map[Long, Long] =
        r.filter(_._1 < Shift)

      val (lpa, tLpa) = timed(
        FeedShapes.labelPropagation(edges, 3, broadcastLabels = false)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      if (m == 1) lpaBase = lpa
      val lpaOk = baseSlice(lpa) == lpaBase

      val (core, tCore) = timed(
        FeedShapes.kCore(edges, k = 3, rounds = 4, broadcastAlive = false)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      if (m == 1) coreBase = core
      val coreOk = baseSlice(core) == coreBase

      // HITS invariance note: replicas are isomorphic, so each holds
      // the same max score — the GLOBAL max-norm equals the per-replica
      // norm and replica 0's (hub, auth) must match scale 1 exactly.
      // (h, a) packed into one long (both ≤ 1e6) for the map compare.
      val (hts, tHits) = timed(
        FeedShapes.hits(edges, iterations = 2, broadcastScores = false)
          .select(col("u"),
            (col("h") * lit(10000000L) + col("a")).as("ha"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)
      if (m == 1) hitsBase = hts
      val hitsOk = baseSlice(hts) == hitsBase

      println(s"""{"probe":"graph","scale":$m,"edges":$nEdges,""" +
        s""""lpa_sec":$tLpa,"lpa_nodes":${lpa.size},"lpa_base_invariant":$lpaOk,""" +
        s""""kcore_sec":$tCore,"kcore_nodes":${core.size},"kcore_base_invariant":$coreOk,""" +
        s""""hits_sec":$tHits,"hits_nodes":${hts.size},"hits_base_invariant":$hitsOk}""")
      // hard-fail AFTER printing the row so CI-style runs can't miss a
      // violated invariance (exit nonzero, row still visible in logs)
      require(lpaOk && coreOk && hitsOk,
        s"base-slice invariance violated at scale $m (lpa=$lpaOk kcore=$coreOk hits=$hitsOk)")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
