package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` is one operator from SURVEY.md §2 expressed
  * over the testdata corpus; `oracleSql` carries the equivalent DuckDB
  * SQL for the driver's hash compare. Column names/aliases match
  * between the two by construction (the compare sorts columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  private val modules: Seq[QueryModule] = Seq(
    QueryModule(Relational.queries, Relational.oracles),
    QueryModule(Aggregates.queries, Aggregates.oracles),
    QueryModule(FeedShapes.queries, FeedShapes.oracles),
    QueryModule(TextAnalysis.queries, TextAnalysis.oracles),
    QueryModule(DedupShapes.queries, DedupShapes.oracles),
    QueryModule(SimilarityShapes.queries, SimilarityShapes.oracles),
    QueryModule(MiscShapes.queries, MiscShapes.oracles),
    QueryModule(CurationOps.queries, CurationOps.oracles),
    QueryModule(Classifier.queries, Classifier.oracles),
    QueryModule(BenchShapes.queries, BenchShapes.oracles),
    QueryModule(AsOf.queries, AsOf.oracles),
    QueryModule(Temporal.queries, Temporal.oracles),
    QueryModule(BloomIndex.queries, BloomIndex.oracles),
    QueryModule(Lexical.queries, Lexical.oracles),
    QueryModule(Analytics.queries, Analytics.oracles),
    QueryModule(Evaluation.queries, Evaluation.oracles),
    QueryModule(Decorrelated.queries, Decorrelated.oracles),
    QueryModule(AuditOps.queries, AuditOps.oracles),
    QueryModule(CorpusStats.queries, CorpusStats.oracles),
    QueryModule(StreamingShapes.queries, StreamingShapes.oracles))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.queries).reduce(_ ++ _)

  /** Oracles ship with MATERIALIZED CTE hints (see OracleSqlCompat:
    * DuckDB 1.0 re-inlines CTE chains under WITH RECURSIVE — q99's
    * mirror went ~7 min → 0.6 s at sf0.01). */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
      .map { case (k, v) => k -> OracleSqlCompat.materializeCtes(v) }
}

final case class QueryModule(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracles: Map[String, String])
