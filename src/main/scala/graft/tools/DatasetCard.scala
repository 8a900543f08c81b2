package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.ops.TextAnalysis

/** Dataset-card generator: one JSON document summarizing a corpus the
  * way a dataset release documents itself — composition (docs/tokens
  * per lang × source, from the q75 rollup), the temperature-scaled
  * mixture a 1M-token run would sample (q76), the quality-decile
  * curriculum table (q79), and the train/val split fractions (q66).
  * Every number comes from an oracle-gated operator, so the card is
  * a certified artifact, not a best-effort summary.
  *
  * Usage: runMain graft.tools.DatasetCard [sfDir]
  */
object DatasetCard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "dataset-card")
    spark.sparkContext.setLogLevel("ERROR")

    def js(v: Any): String = v match {
      case null => "null"
      case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case x => x.toString
    }
    def rowsJson(df: org.apache.spark.sql.DataFrame): String =
      df.collect().map(r =>
        df.columns.zipWithIndex.map { case (c, i) => s"${js(c)}:${js(r.get(i))}" }
          .mkString("{", ",", "}")).mkString("[", ",", "]")

    val docs = graft.Tables.load(spark, dir, "documents")
    val total = TextAnalysis.corpusStats(spark, dir)
      .filter(col("lang").isNull).head()
    val splits = TextAnalysis.hashSplit(docs, "doc_id", "v1")
      .groupBy(col("split")).agg(count(lit(1)).as("n"))

    println(s"""{"dataset":${js(dir)},"n_docs":${total.getLong(2)},""" +
      s""""total_tokens":${total.getLong(3)},""" +
      s""""composition":${rowsJson(TextAnalysis.corpusStats(spark, dir).filter(col("lang").isNotNull && col("source").isNotNull))},""" +
      s""""mixture_1m_alpha05":${rowsJson(TextAnalysis.mixture(spark, dir))},""" +
      s""""quality_deciles":${rowsJson(TextAnalysis.qualityDeciles(spark, dir))},""" +
      s""""split":${rowsJson(splits)}}""")
    spark.stop()
  }
}
