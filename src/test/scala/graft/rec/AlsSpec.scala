package graft.rec

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AlsSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("ALS trains on the ratings view and lands in a sane RMSE band") {
    val r = Ratings.view(spark, sfDir).cache()
    val Array(train, test) = r.randomSplit(Array(0.8, 0.2), seed = 42L)
    val model = AlsPipeline.fit(train)
    val rmse = AlsPipeline.rmse(model, test)
    // ratings are 1..5 with strong noise; anything in (0, 2.5) means the
    // factorization actually fit signal (global-mean baseline ≈ 1.4).
    assert(rmse > 0.0 && rmse < 2.5, s"rmse=$rmse out of band")
  }

  test("explicit factor dot-product scoring matches model.transform") {
    val r = Ratings.view(spark, sfDir).cache()
    val model = AlsPipeline.fit(r, rank = 4, maxIter = 3)
    val sample = r.select($"user_id", $"item_id").limit(50)
    val viaTransform = model.transform(sample)
      .select($"user_id", $"item_id", $"prediction")
      .as[(Long, Long, Float)].collect().map(x => (x._1, x._2) -> x._3).toMap
    val viaExplicit = AlsPipeline.scoreExplicit(model, sample)
      .select($"user_id", $"item_id", $"score")
      .as[(Long, Long, Float)].collect()
    assert(viaExplicit.nonEmpty)
    viaExplicit.foreach { case (u, i, s) =>
      assert(math.abs(s - viaTransform((u, i))) < 1e-4f)
    }
  }

  test("recommendTopK returns k unseen items per user, rank 1..k") {
    val r = Ratings.view(spark, sfDir).cache()
    val model = AlsPipeline.fit(r)
    val users = r.select($"user_id").where($"user_id" < 5).distinct()
    val recs = AlsPipeline.recommendTopK(model, r, users, 3).cache()
    val perUser = recs.groupBy($"user_id").agg(
      count(lit(1)).as("n"), max($"rank").as("maxr")).collect()
    assert(perUser.nonEmpty)
    perUser.foreach { row =>
      assert(row.getLong(1) <= 3 && row.getLong(2) <= 3)
    }
    // no recommended item was already rated
    val overlap = recs.join(r, Seq("user_id", "item_id"), "inner").count()
    assert(overlap == 0L)
  }

  test("planned recommendTopK matches the recommendForUserSubset reference") {
    val r = Ratings.view(spark, sfDir).cache()
    val model = AlsPipeline.fit(r, rank = 4, maxIter = 3)
    val users = r.select($"user_id").where($"user_id" < 8).distinct()
    val k = 4
    val planned = AlsPipeline.recommendTopK(model, r, users, k)
      .select($"user_id".cast("long"), $"item_id".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // reference path: MLlib's own ranking, over-fetched wide enough to
    // survive the anti-join, then trimmed to k driver-side
    val maxRated = r.groupBy("user_id").count()
      .agg(max("count")).head().getLong(0).toInt
    val ref = model.recommendForUserSubset(users, k + maxRated)
      .select($"user_id", posexplode($"recommendations"))
      .select($"user_id".cast("long").as("user_id"), $"pos",
        $"col.item_id".cast("long").as("item_id"))
      .join(r.select("user_id", "item_id"), Seq("user_id", "item_id"),
        "left_anti")
      .as[(Long, Long, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).take(k).map(_._2).toSet).toMap

    assert(planned.keySet == ref.keySet)
    // compare via scores, not raw item ids: MLlib accumulates the dot
    // product in float, the planned path in double — exact ties may
    // permute, but the per-user score vectors must match.
    val uf = model.userFactors.collect()
      .map(r0 => r0.getInt(0).toLong -> r0.getSeq[Float](1).toArray).toMap
    val itf = model.itemFactors.collect()
      .map(r0 => r0.getInt(0).toLong -> r0.getSeq[Float](1).toArray).toMap
    def score(u: Long, i: Long): Double =
      uf(u).zip(itf(i)).map { case (a, b) => a.toDouble * b.toDouble }.sum
    planned.foreach { case (u, items) =>
      val ps = items.toSeq.map(score(u, _)).sorted
      val rs = ref(u).toSeq.map(score(u, _)).sorted
      ps.zip(rs).foreach { case (a, b) => assert(math.abs(a - b) < 1e-4) }
    }
  }
}
