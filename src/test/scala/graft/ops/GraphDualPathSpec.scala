package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dual-path equality for the iterative graph ops (the q103/q109
  * precedent): the scale-safe shuffle-join default and the
  * small-graph broadcast fast path must produce identical results —
  * the flag trades plan shape, never semantics. */
class GraphDualPathSpec extends SparkSpec {
  import spark.implicits._

  private val edges = ((1L to 40L).map(u => u -> (u % 11)) ++
    (1L to 40L).map(u => u -> ((u * 3 + 1) % 11)) ++
    (1L to 40L).filter(_ % 3 == 0).map(u => u -> ((u * 13 + 5) % 17)))
    .filter(p => p._1 != p._2)

  test("labelPropagation: shuffle default equals broadcast fast path") {
    val df = edges.toDF("u", "v")
    val a = FeedShapes.labelPropagation(df, 3, broadcastLabels = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = FeedShapes.labelPropagation(df, 3, broadcastLabels = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("kCore: shuffle default equals broadcast fast path") {
    val df = edges.toDF("u", "v")
    val a = FeedShapes.kCore(df, k = 3, rounds = 4, broadcastAlive = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = FeedShapes.kCore(df, k = 3, rounds = 4, broadcastAlive = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b && a.nonEmpty)
  }

  test("labelPropagation converges on two disjoint cliques to per-clique labels") {
    // two 4-cliques; LPA should settle each clique on its min label
    val clique = (base: Long) => for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (base + a, base + b)
    val df = (clique(1L) ++ clique(10L)).toDF("u", "v")
    val out = FeedShapes.labelPropagation(df, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 4L).map(out).toSet.size == 1)
    assert((10L to 13L).map(out).toSet.size == 1)
  }
}
