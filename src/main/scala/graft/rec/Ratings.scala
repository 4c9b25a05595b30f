package graft.rec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The engine's ratings fact (ref data model SURVEY §1.1: `user_id,
  * movie_id, rating, timestamp`), synthesized deterministically from the
  * fixture star schema: user = o_custkey, item = l_partkey, rating =
  * 1 + (l_quantity mod 5) ∈ {1..5}, averaged over repeat purchases.
  *
  * Because l_quantity is integral, every derived rating is an exact
  * double, and sums/averages are exact in both Spark and DuckDB — the
  * whole recommender catalog is float-parity-safe against the oracle.
  */
object Ratings {

  def view(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("user_id"),
               col("l_partkey").as("item_id"))
      .agg(avg(lit(1.0) + (col("l_quantity") % 5)).as("rating"))

  /** Matching DuckDB CTE body (kept adjacent so they cannot drift). */
  val viewSql: String =
    """SELECT o_custkey AS user_id, l_partkey AS item_id,
       avg(1.0 + (l_quantity % 5)) AS rating
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY 1, 2"""

  /** Per-user degree cap: keep each user's top-`cap` ratings (by rating
    * desc, item_id asc — deterministic, and rating is an exact ratio of
    * integers so the ordering is float-parity-safe cross-engine). This is
    * the standard skew guard for user-keyed self-joins: a power user with
    * d ratings contributes O(d²) pairs, so capping d bounds the worst key
    * at O(cap²) no matter how skewed the user distribution gets at 100 TB.
    */
  def capped(ratings: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("rating").desc, col("item_id"))
    ratings.withColumn("rn", row_number().over(w))
      .where(col("rn") <= cap)
      .drop("rn")
  }

  /** Matching DuckDB SQL for [[capped]], over the [[viewSql]] CTE body. */
  def cappedSql(cap: Int): String =
    s"""SELECT user_id, item_id, rating FROM (
        SELECT user_id, item_id, rating,
          row_number() OVER (PARTITION BY user_id
            ORDER BY rating DESC, item_id) AS rn
        FROM ($viewSql) rv) t WHERE rn <= $cap"""
}
