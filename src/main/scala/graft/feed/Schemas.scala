package graft.feed

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Entity model of the feed domain (reference
  * internal/models/models.go:5-20 and
  * migrations/cassandra/000001_init_tables.up.cql).
  *
  * The reference's six denormalized Cassandra tables collapse to four
  * logical tables (FIXTURES.md §1): `users_by_username` and
  * `followers_by_followee` are projections of `users` / `follows` —
  * columnar storage + predicate pushdown replace the reverse-index
  * tables (SURVEY.md §4).
  */
case class User(user_id: String, username: String)

/** One follow edge; logical PK (user_id, followee_id) — duplicate
  * inserts are upserts (reference internal/store/feed.go:78-90). */
case class Follow(user_id: String, followee_id: String)

case class Post(post_id: String, author_id: String, body: String, created_at: Timestamp)

/** Materialized fan-out row; logical PK (user_id, created_at, post_id),
  * read newest-first (cql:30-37). */
case class FeedEntry(user_id: String, post_id: String, author_id: String,
    body: String, created_at: Timestamp)

object Schemas {
  /** Kafka envelope: JSON `Post` with the reference's json tags —
    * field names differ from column names (`id`, `created`;
    * models.go:10-15). Explicit schema = schema-on-read exactly like
    * the worker's json.Unmarshal: unknown fields dropped, missing
    * fields null (SURVEY.md §1.3). */
  val kafkaPost: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("author_id", StringType),
    StructField("body", StringType),
    StructField("created", TimestampType)))

  val user: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("username", StringType, nullable = false)))

  val follow: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("followee_id", StringType, nullable = false)))

  val post: StructType = StructType(Seq(
    StructField("post_id", StringType, nullable = false),
    StructField("author_id", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  val feedEntry: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("post_id", StringType, nullable = false),
    StructField("author_id", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  /** Feed-row logical key (duplicate-masking upsert key, cql:36). */
  val feedKey: Seq[String] = Seq("user_id", "post_id")
}
