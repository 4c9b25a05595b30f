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
}
