package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.ops.Dedup

/** One-off stage profile of the MinHash+LSH pipeline (dev tool). */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      math.min(32, Runtime.getRuntime.availableProcessors).toString, "profmh")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val docs = Tables.load(spark, dir, "documents")
      val sets = Dedup.docShingleArrays(
        Dedup.wordBigrams(docs, "doc_id", "text")).persist()
      time("doc-arrays")(println(s"  n_docs=${sets.count()}"))
      val bands = Dedup.lshBandsFromArrays(sets, 8, 2).persist()
      time("bands")(println(s"  n_bands=${bands.count()}"))
      val cand = time("candidates")(Dedup.lshCandidates(bands).localCheckpoint(true))
      println(s"  n_cand=${cand.count()}")
      time("verify-jaccard")(
        println(s"  n_pairs=${Dedup.jaccardForCandidates(sets, cand, 0.5).count()}"))
      sets.unpersist(); bands.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
