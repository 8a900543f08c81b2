package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.feed.Fanout

/** BASELINE.md measurement plan re-expressed on the engine: the
  * reference e2e bench workload (50 users, 10 follows/user, 100
  * posts — bench/e2e_bench/e2e_bench.go:44-49) generated
  * deterministically (arithmetic instead of seeded rand, so the DuckDB
  * oracle certifies the whole measurement pipeline), pushed through
  * the REAL fan-out + delivery-verification operators.
  *
  * Bench timing of this query ≈ the reference's e2e throughput shape
  * (posts × followers materialized + verified); the statistics
  * computation itself is the engine's A2/A3 operators, so the
  * measurement code is a correctness artifact (BASELINE.md).
  */
object BenchShapes {
  private val U = 50   // users
  private val F = 10   // follows per user
  private val P = 100  // posts

  /** users i follows (i*7+j) % U for j in 1..F, self-follows skipped
    * (mirrors e2e_bench.go:106-108's skip). */
  private def follows(s: SparkSession): DataFrame =
    s.range(U).select(col("id").as("u"))
      .crossJoin(s.range(1, F + 1).select(col("id").as("j")))
      .withColumn("followee", (col("u") * 7 + col("j")) % U)
      .filter(col("followee") =!= col("u"))
      .select(concat(lit("user-"), col("u")).as("user_id"),
        concat(lit("user-"), col("followee")).as("followee_id"))
      .distinct()

  /** post p authored by user (p*13) % U at t0 + p seconds. */
  private def posts(s: SparkSession): DataFrame =
    s.range(P).select(
      concat(lit("post-"), col("id")).as("post_id"),
      concat(lit("user-"), (col("id") * 13) % U).as("author_id"),
      concat(lit("body-"), col("id")).as("body"),
      timestamp_seconds(lit(1767225600L) + col("id")).as("created_at"))

  /** Full e2e: generate → fan out → verify delivery (anti-join must
    * be empty) → per-author delivery stats.
    *
    * The verification anti-join compares the delivered feed against an
    * expected side derived as a RAW join expression over its own
    * generator calls — NOT routed through `Fanout.fanout`. Routing
    * both sides through the operator under test (the round-5 form)
    * only proved plan determinism: a deterministic fan-out bug would
    * produce identical wrong rows on both sides and cancel. This
    * mirrors the reference's independent per-(post, follower)
    * recomputation (e2e_bench.go:175-232); BenchShapesSpec plants a
    * row-dropping fan-out bug and shows `n_undelivered` catches it.
    * Every frame here is generated and constant-size (≤ U·F·P rows):
    * broadcast the fan-out edge side, the anti-join's lookup side and
    * the stats join so the whole verification plans broadcast-only,
    * no SMJ and no shuffle of the post stream. */
  def e2eFeedWith(s: SparkSession,
      fanoutFn: (DataFrame, DataFrame) => DataFrame): DataFrame = {
    val feed = fanoutFn(posts(s), broadcast(follows(s)))
    val pE = posts(s)
    val fE = follows(s)
    val expected = pE.join(broadcast(fE), pE("author_id") === fE("followee_id"))
      .select(fE("user_id"), pE("post_id"), pE("author_id"),
        pE("body"), pE("created_at"))
    val missing = Fanout.undelivered(expected, broadcast(feed))
      .groupBy(col("author_id")).agg(count(lit(1)).as("n_undelivered"))
    feed.groupBy(col("author_id"))
      .agg(countDistinct(col("post_id")).as("n_posts"),
        count(lit(1)).as("n_deliveries"))
      .join(broadcast(missing), Seq("author_id"), "left")
      .withColumn("n_undelivered", coalesce(col("n_undelivered"), lit(0L)))
      .orderBy(col("author_id"))
  }

  def e2eFeed(s: SparkSession, dir: String): DataFrame =
    e2eFeedWith(s, (p, f) => Fanout.fanout(p, f))

  val e2eFeedSql: String =
    s"""WITH f AS (SELECT DISTINCT 'user-' || CAST(u AS VARCHAR) AS user_id,
       |    'user-' || CAST((u * 7 + j) % $U AS VARCHAR) AS followee_id
       |  FROM range($U) t1(u), range(1, ${F + 1}) t2(j)
       |  WHERE (u * 7 + j) % $U <> u),
       |p AS (SELECT 'post-' || CAST(id AS VARCHAR) AS post_id,
       |    'user-' || CAST((id * 13) % $U AS VARCHAR) AS author_id
       |  FROM range($P) t(id)),
       |feed AS (SELECT f.user_id, p.post_id, p.author_id
       |  FROM p JOIN f ON p.author_id = f.followee_id)
       |SELECT author_id, count(DISTINCT post_id) AS n_posts,
       |  count(*) AS n_deliveries, CAST(0 AS BIGINT) AS n_undelivered
       |FROM feed GROUP BY author_id ORDER BY author_id""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_e2e_feed" -> e2eFeed)

  def oracles: Map[String, String] = Map(
    "q39_e2e_feed" -> e2eFeedSql)
}
