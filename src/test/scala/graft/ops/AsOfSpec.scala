package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof join: latest right at-or-before, per key; equal ts visible; no right → null") {
    val left = Seq(
      ("u1", 10L, "p1"), ("u1", 20L, "p2"), ("u1", 5L, "p0"),
      ("u2", 15L, "p3")).toDF("k", "ts", "pid")
    val right = Seq(
      ("u1", 10L, 100.0), // equal-ts: visible to p1
      ("u1", 12L, 200.0),
      ("u2", 99L, 900.0)  // after u2's only left row
    ).toDF("k", "ts", "v")
    val got = AsOf.asofJoin(left, right, "k", "ts", "v")
      .select("pid", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(got == Map(
      "p0" -> None,        // before any right
      "p1" -> Some(100.0), // ts tie → visible
      "p2" -> Some(200.0), // latest before 20
      "p3" -> None))       // right only after
  }

  test("asof join preserves all left columns and row count") {
    val left = (1 to 50).map(i => (s"u${i % 5}", i.toLong, s"x$i")).toDF("k", "ts", "payload")
    val right = (1 to 10).map(i => (s"u${i % 5}", (i * 3).toLong, i.toDouble)).toDF("k", "ts", "v")
    val out = AsOf.asofJoin(left, right, "k", "ts", "v")
    assert(out.count() == 50)
    assert(out.columns.toSeq == Seq("k", "ts", "payload", "asof_v"))
  }
}
