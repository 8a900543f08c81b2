package graft.ops

import graft.SparkSpec

/** The streaming gate queries (q232–q234) asserted ENGINE-SIDE equal
  * to their batch twins over the sf0.001 corpus — the same equality
  * the DuckDB oracle certifies at gate SFs, pinned here so a
  * refactor of the canonical-id publish step or the availableNow
  * plumbing fails fast in the suite. (CorpusStreamSpec pins the
  * operator-level semantics on hand-built corpora, including the
  * exact-dup first-wins-vs-min-id case the publish step exists for;
  * these tests pin the full gate composition.) */
class StreamingShapesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("q232 streaming clean gate == batch corpusPipeline (sf0.001)") {
    assert(rows(StreamingShapes.streamCleanGate(spark, dir)) ==
      rows(DedupShapes.corpusPipeline(spark, dir)))
  }

  test("q233 streaming recipe gate == batch trainingRecipe (sf0.001)") {
    assert(rows(StreamingShapes.streamRecipeGate(spark, dir)) ==
      rows(DedupShapes.trainingRecipe(spark, dir)))
  }

  test("q234 streaming release gate == batch releaseGate (sf0.001)") {
    assert(rows(StreamingShapes.streamReleaseGate(spark, dir)) ==
      rows(CorpusStats.releaseGate(spark, dir)))
  }
}
