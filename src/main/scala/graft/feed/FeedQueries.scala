package graft.feed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's six fixed query shapes as a relational API
  * (SURVEY.md §2.2). All pure Catalyst — predicates push into the
  * scan; the reverse-adjacency "table" is the same edge DataFrame
  * filtered on the other key.
  */
object FeedQueries {

  /** R1 — username → user_id; 0/1 rows, not-found is empty not error
    * (reference internal/store/feed.go:14-28). */
  def userIdByUsername(users: DataFrame, username: String): DataFrame =
    users.filter(col("username") === lit(username)).select(col("user_id"))

  /** R2 — followers of X: the reverse-index read
    * (internal/store/feed.go:92-111) as a filter on the single edge
    * table. */
  def followers(follows: DataFrame, followeeId: String): DataFrame =
    follows.filter(col("followee_id") === lit(followeeId)).select(col("user_id"))

  /** Forward adjacency — who X follows (the `follows` table's own
    * query shape, cql:11-15). */
  def following(follows: DataFrame, userId: String): DataFrame =
    follows.filter(col("user_id") === lit(userId)).select(col("followee_id"))

  /** R3 + R4 — top-K feed for one user, newest first, default limit 50
    * (internal/store/feed.go:143-148; default cmd/server/httphandlers.go:191-196).
    * Plans as TakeOrderedAndProject — O(n log k), no full sort. */
  def feedTopK(feed: DataFrame, userId: String, limit: Int = 50): DataFrame = {
    val n = math.max(1, limit)
    feed.filter(col("user_id") === lit(userId))
      .orderBy(col("created_at").desc, col("post_id"))
      .limit(n)
  }

  /** R3 all-users form — top-K per user via ranked window (the shape a
    * batch backfill uses; SURVEY §2.2 R3 note). */
  def feedTopKAllUsers(feed: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("created_at").desc, col("post_id"))
    feed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= lit(k))
      .drop("rn")
  }

  /** R6 — validation predicates (username 1–50, body 1–1000;
    * cmd/server/httphandlers.go:33-37,134-137). */
  val validUsername: Column = length(col("username")).between(1, 50)
  val validBody: Column = length(col("body")).between(1, 1000)

  def validUsers(users: DataFrame): DataFrame = users.filter(validUsername)
  def invalidUsers(users: DataFrame): DataFrame = users.filter(!validUsername)
  def validPosts(posts: DataFrame): DataFrame = posts.filter(validBody)
  def invalidPosts(posts: DataFrame): DataFrame = posts.filter(!validBody)
}
