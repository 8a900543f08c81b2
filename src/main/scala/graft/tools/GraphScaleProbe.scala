package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.FeedShapes

/** Scaling probe for the iterative graph family (q158 k-core): build
  * the q158 customer graph, replicate it m× as DISJOINT copies (node
  * ids shifted by i·10^8 — the k-core of a disjoint union is exactly
  * the union of the k-cores, so correctness at depth is checkable
  * bit-for-bit, not statistically), run the 4-round peel, and report
  * edges/s per scale. The correctness half: survivor count must be
  * exactly m× the scale-1 core and every replica-0 survivor must
  * match the scale-1 survivor set with identical degrees — any drift
  * means the per-round broadcast semi-joins leaked across rounds.
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

    val c = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("u"))
    val base = c.select(col("u"), (col("u") % 211).as("v"))
      .unionByName(c.select(col("u"), ((col("u") * 7 + 3) % 211).as("v")))
      .unionByName(c.filter(col("u") % 3 === 0)
        .select(col("u"), ((col("u") * 13 + 5) % 431).as("v")))
      .filter(col("u") =!= col("v"))

    var base1: Map[Long, Long] = Map.empty
    scales.foreach { m =>
      val edges = (0 until m).map { i =>
        val off = i * 100000000L
        base.select((col("u") + off).as("u"), (col("v") + off).as("v"))
      }.reduce(_ unionByName _).repartition(32).localCheckpoint(true)
      val nEdges = edges.count()
      val t0 = System.nanoTime()
      val core = FeedShapes.kCore(edges, k = 3, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val sec = (System.nanoTime() - t0) / 1e9
      val rep0 = core.filter(_._1 < 100000000L)
      if (m == 1) base1 = core
      val invariant = rep0 == base1 && core.size == base1.size * m
      println(f"""{"metric":"graph_scale_probe","scale":$m,"edges":$nEdges,""" +
        f""""core_size":${core.size},"replica0_invariant":$invariant,""" +
        f""""sec":$sec%.2f,"edges_per_sec":${(nEdges / sec).toLong}}""")
      require(invariant, s"k-core invariance violated at scale $m")
    }
    spark.stop()
  }
}
