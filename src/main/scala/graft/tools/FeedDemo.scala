package graft.tools

import java.nio.file.Files
import graft.GraftSession
import graft.feed._

/** End-to-end demo of the streaming feed pipeline over a real file
  * stream source (the Kafka source swaps in with one line — both are
  * `readStream` DataFrames with a `value` column).
  *
  * Drives the FIXTURES.md §3 canonical scenario plus a dead-letter
  * message, then reads the feed back through FeedQueries.feedTopK.
  */
object FeedDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4", "feed-demo")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val in = Files.createTempDirectory("posts-in").toString
    val feedPath = Files.createTempDirectory("feed").toString
    val dlPath = Files.createTempDirectory("dead").toString
    val ckpt = Files.createTempDirectory("ckpt").toString

    // "Kafka topic" contents: two posts by u-nur, one poison message.
    Files.writeString(java.nio.file.Paths.get(s"$in/batch0.txt"),
      """{"id":"p-100","author_id":"u-nur","body":"Hello from Nur!","created":"2026-01-01T00:00:00Z"}
        |{"id":"p-101","author_id":"u-nur","body":"Second post","created":"2026-01-02T00:00:00Z"}
        |{invalid-json}""".stripMargin)

    val follows = Seq(Follow("u-almaz", "u-nur"), Follow("u-dana", "u-nur")).toDS.toDF
    val raw = spark.readStream.text(in).withColumnRenamed("value", "value")

    val q = FeedStream.start(spark, raw, follows, feedPath, ckpt, Some(dlPath))
    q.processAllAvailable()
    q.stop()

    val feed = spark.read.schema(Schemas.feedEntry).parquet(feedPath)
    println("=== feed(u-almaz), newest first ===")
    FeedQueries.feedTopK(feed, "u-almaz").show(false)
    println("=== feed(u-nur) — no self-feed ===")
    FeedQueries.feedTopK(feed, "u-nur").show(false)
    println("=== dead letters ===")
    spark.read.parquet(dlPath).show(false)

    val total = feed.count()
    val dead = spark.read.parquet(dlPath).count()
    println(s"FEED_ROWS=$total DEAD_LETTERS=$dead")
    require(total == 4 && dead == 1, "demo invariant violated")
    spark.stop()
  }
}
