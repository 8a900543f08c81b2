package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** Throwaway: per-job wall times for one query. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = GraftSession.local("32", "jobprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val starts = TrieMap.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          println(f"JOB ${j.jobId}%4d ${(System.nanoTime()-t0)/1e9}%7.3f s  $d")
        }
    })
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).count()
      println(f"REP $r total ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
