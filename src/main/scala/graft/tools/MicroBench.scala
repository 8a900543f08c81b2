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
      sets.unpersist(); bands.unpersist()
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
    spark.stop()
  }
}
