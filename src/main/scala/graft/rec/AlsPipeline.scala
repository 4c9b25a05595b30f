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

  /** Top-k recommendations for a user subset, excluding already-rated
    * items via left-anti join (P7). Output: user_id, item_id, rank. */
  def recommendTopK(model: ALSModel, ratings: DataFrame, users: DataFrame,
                    k: Int): DataFrame = {
    // Over-fetch k + max-rated to survive the anti-join, then re-rank.
    val maxRated = ratings.groupBy("user_id").count()
      .agg(max("count")).head().getLong(0).toInt
    val recs = model.recommendForUserSubset(users, k + maxRated)
      .select(col("user_id"), posexplode(col("recommendations")))
      .select(col("user_id"), col("pos"),
        col("col.item_id").as("item_id"), col("col.rating").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("pos"))
    recs.join(ratings.select("user_id", "item_id"), Seq("user_id", "item_id"),
        "left_anti")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("user_id"), col("item_id"), col("rank"))
  }
}
