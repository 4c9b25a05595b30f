package graft.rec

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ALS collaborative filtering (SURVEY §2.10 M1–M3, §3.1), mirroring the
  * reference's configuration (`/root/reference/src/als/spark_als.py:
  * 100-113`: explicit feedback, nonnegative factors) on MLlib's native
  * implementation. Factor tables stay distributed end to end; serving is
  * `recommendForUserSubset` + an anti-join against already-rated items
  * (replacing the reference's collect-to-driver set,
  * `src/csv/recommend.py:113-135`).
  */
object AlsPipeline {

  def fit(ratings: DataFrame, rank: Int = 8, maxIter: Int = 5,
          regParam: Double = 0.1, seed: Long = 42L): ALSModel =
    new ALS()
      .setUserCol("user_id").setItemCol("item_id").setRatingCol("rating")
      .setRank(rank).setMaxIter(maxIter).setRegParam(regParam)
      .setNonnegative(true)
      .setColdStartStrategy("drop")
      .setSeed(seed)
      .fit(ratings)

  /** RMSE on a holdout (ref `spark_als.py:161-169`: transform → na.drop →
    * RegressionEvaluator). */
  def rmse(model: ALSModel, holdout: DataFrame): Double =
    new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("rating").setPredictionCol("prediction")
      .evaluate(model.transform(holdout).na.drop())

  /** F13 explicit serve path (ref `doc/课程报告.md:762-765` û = u·vᵀ;
    * SURVEY §3.3): score (user, item) pairs by joining the model's factor
    * tables and taking the array dot product — the same number MLlib's
    * `transform` produces, but as a plain relational plan over factor
    * DataFrames, so any downstream operator (anti-join, window top-k,
    * upsert) composes with it. */
  def scoreExplicit(model: ALSModel, pairs: DataFrame): DataFrame =
    scoreFactors(
      model.userFactors.select(col("id").as("user_id"), col("features").as("uf")),
      model.itemFactors.select(col("id").as("item_id"), col("features").as("if")),
      pairs)
      .withColumn("score", col("score").cast("float")) // MLlib transform parity

  /** The factor-join scoring core of [[scoreExplicit]], over PLAIN factor
    * TABLES (`user_id, uf` / `item_id, if`) rather than a trained model —
    * factors are just data to the serving plan, which is what lets q125
    * hash-check this exact path against a DuckDB oracle with fixed
    * factor tables (the trained q37 face stays rows-only: ALS output is
    * nondeterministic).
    *
    * Scale note — why the ITEM side carries the broadcast hint: item
    * catalogs are the small, bounded dimension of a recommender (ml-10M:
    * 10,681 items × rank 10 floats ≈ 0.5 MB). The USER side is the
    * unbounded one and is never broadcast. The practical broadcast
    * comfort zone is well under 1 GB serialized: past that the driver's
    * BroadcastExchange collect trips `spark.driver.maxResultSize` (1 GB
    * default) and every executor pins a full copy on heap — a 10M-item
    * catalog at rank 64 (~2.5 GB of factors) does NOT broadcast on
    * default configs and would need maxResultSize plus driver/executor
    * memory raised to even try. At that size, drop the hint and let the
    * item join shuffle — the plan degrades to a sort-merge join on
    * item_id, which is correct and partition-parallel, just no longer
    * map-side. PlanSpec pins the broadcast SIDE under
    * autoBroadcastJoinThreshold=-1 (item join stays the only
    * BroadcastHashJoin, user join degrades to SortMergeJoin), so both a
    * dropped hint and a user-side broadcast fail the suite. */
  def scoreFactors(userFactors: DataFrame, itemFactors: DataFrame,
                   pairs: DataFrame): DataFrame =
    pairs
      .join(userFactors, Seq("user_id"))
      .join(broadcast(itemFactors), Seq("item_id"))
      .withColumn("score",
        graft.expr.GraftFunctions.dotProduct(col("uf"), col("if")))
      .drop("uf", "if")

  /** Top-k recommendations for a user subset, excluding already-rated
    * items via left-anti join (P7). Output: user_id, item_id, rank.
    *
    * Fully planned — no driver-side action anywhere: candidates are the
    * subset × item-factor catalog (the served users broadcast against the
    * distributed item side) minus rated items, scored by the explicit
    * factor join ([[scoreExplicit]]), ranked by a per-user window top-k
    * (ties broken by item_id, so serving is deterministic). This replaces
    * the earlier `recommendForUserSubset` + over-fetch shape, whose fetch
    * width was `k + max-rated-in-subset` — one power user with 100k
    * ratings made EVERY served user materialize 100k+k candidates. Here a
    * power user only enlarges the anti-join's build side, and the scored
    * candidate set is always |users|·|items| − |rated|, pruned to top-k
    * inside the window (Spark ≥3.5 plans rank≤k as a group limit). */
  def recommendTopK(model: ALSModel, ratings: DataFrame, users: DataFrame,
                    k: Int): DataFrame =
    serveTopK(
      model.userFactors.select(col("id").as("user_id"), col("features").as("uf")),
      model.itemFactors.select(col("id").as("item_id"), col("features").as("if")),
      ratings, users, k, floatScores = true)
      .select(col("user_id"), col("item_id"), col("rank"))

  /** The serving core of [[recommendTopK]] over plain factor tables
    * (candidate generation → anti-join → [[scoreFactors]] → per-user
    * window top-k), returning the score alongside the rank. q37 serves
    * TRAINED factors through this path (rows-only — ALS is
    * nondeterministic); q125 serves FIXED factor tables through the
    * SAME path, which is what gives the path itself a hash-checked
    * DuckDB oracle. `floatScores` ranks on the float-cast score —
    * [[recommendTopK]]'s MLlib-transform parity — while q125 ranks the
    * exact doubles its oracle can reproduce. */
  def serveTopK(userFactors: DataFrame, itemFactors: DataFrame,
                ratings: DataFrame, users: DataFrame, k: Int,
                floatScores: Boolean = false): DataFrame = {
    val items = itemFactors.select(col("item_id"))
    val cand = items.crossJoin(broadcast(users.select(col("user_id"))))
      .join(ratings.select("user_id", "item_id"), Seq("user_id", "item_id"),
        "left_anti")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("score").desc, col("item_id"))
    val scored = scoreFactors(userFactors, itemFactors, cand)
    (if (floatScores)
       scored.withColumn("score", col("score").cast("float"))
     else scored)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("user_id"), col("item_id"), col("rank"),
        round(col("score"), 6).as("score"))
  }
}
