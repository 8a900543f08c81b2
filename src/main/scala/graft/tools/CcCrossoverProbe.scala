package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.Dedup

/** Crossover probe for `Dedup.connectedComponents`' two paths: the
  * driver union-find (default below `maxDriverPairs` = 8M pairs) vs
  * the distributed pointer-jumping min-label propagation. Generates a
  * synthetic post-verification pair list shaped like a real dedup's
  * (mostly 4-member families = 3 pairs each, plus one 10k-node chain
  * — the worst case pointer jumping exists for), times BOTH paths at
  * each size, and emits one JSONL row per size — the measurement that
  * justifies (or retunes) the 8M default on this box.
  *
  * Equality of the two paths is asserted at the smallest size (the
  * spec also pins it); larger sizes reuse the same generator so the
  * structure, not the data, varies.
  *
  * Usage: runMain graft.tools.CcCrossoverProbe [millionsOfPairs...]
  */
object CcCrossoverProbe {
  private val ForceDriver = 100L * 1000 * 1000

  def main(args: Array[String]): Unit = {
    val sizesM: Seq[Double] =
      if (args.nonEmpty) args.map(_.toDouble).toSeq
      else Seq(1, 2, 4, 8, 16)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "cc-crossover-probe")
    spark.sparkContext.setLogLevel("ERROR")

    // `n` pairs: a 10k-link chain, remainder 4-member star families
    // (ids disjoint from the chain range). Deterministic, no RNG.
    def pairsOf(n: Long): DataFrame = {
      val chainLinks = math.min(10000L, n / 2)
      val famPairs = n - chainLinks
      val chain = spark.range(chainLinks)
        .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
      val base = 1000000L
      val fams = spark.range(famPairs)
        .select((lit(base) + floor(col("id") / 3L) * 4L).cast("long").as("id_a"),
          (lit(base) + floor(col("id") / 3L) * 4L + (col("id") % 3L) + 1L)
            .cast("long").as("id_b"))
      chain.unionByName(fams)
    }

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    var checked = false
    sizesM.foreach { m =>
      val n = (m * 1e6).toLong
      val pairs = pairsOf(n).repartition(32).localCheckpoint(true)
      val nPairs = pairs.count()
      if (!checked) { // one-time dual-path equality on the real generator
        // NOTE: not Long.MaxValue — connectedComponents does
        // limit((maxDriverPairs + 1).toInt), which would overflow
        val drv = Dedup.connectedComponents(pairs, maxDriverPairs = ForceDriver)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val dist = Dedup.connectedComponents(pairs, maxDriverPairs = 0L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        require(drv == dist, s"path divergence at ${n} pairs")
        checked = true
      }
      val (tDrv, nDrv) = timed(
        Dedup.connectedComponents(pairs, maxDriverPairs = ForceDriver).count())
      val (tDist, nDist) = timed(
        Dedup.connectedComponents(pairs, maxDriverPairs = 0L).count())
      require(nDrv == nDist, s"node-count divergence at $n pairs: $nDrv vs $nDist")
      println(s"""{"probe":"cc_crossover","pairs":$nPairs,"nodes":$nDrv,""" +
        s""""driver_sec":${"%.2f".format(tDrv)},"distributed_sec":${"%.2f".format(tDist)},""" +
        s""""driver_wins":${tDrv < tDist}}""")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
