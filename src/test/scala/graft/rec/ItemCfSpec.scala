package graft.rec

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degree-cap guard for the item-CF self-join (q32): the cap must be a
  * no-op on uniform data and bound power users deterministically.
  */
class ItemCfSpec extends SparkSpec {
  import spark.implicits._

  test("degree cap is the identity when every user is under the cap") {
    val r = (for (u <- 1L to 20L; i <- 1L to 10L)
      yield (u, i * u % 37, 1.0 + (u + i) % 5)).distinct
      .toDF("user_id", "item_id", "rating")
    val capped = Ratings.capped(r, 64)
    assert(capped.count() == r.count())
    assert(capped.except(r).count() == 0L && r.except(capped).count() == 0L)
  }

  test("degree cap keeps exactly the top-cap ratings of a power user") {
    val power = (1L to 200L).map(i => (1L, i, 1.0 + (i % 5).toDouble))
    val normal = (1L to 10L).map(i => (2L, i, 3.0))
    val r = (power ++ normal).toDF("user_id", "item_id", "rating")
    val capped = Ratings.capped(r, 64).cache()
    val byUser = capped.groupBy($"user_id").count().as[(Long, Long)]
      .collect().toMap
    assert(byUser(1L) == 64L, s"power user kept ${byUser(1L)} rows")
    assert(byUser(2L) == 10L)
    // kept set = top by (rating desc, item_id asc): all rating-5s and
    // rating-4s (40 each), then the 24 smallest item_ids among rating-3s
    val kept = capped.where($"user_id" === 1L)
      .select($"item_id", $"rating").as[(Long, Double)].collect()
    val expected = power.sortBy { case (_, i, rt) => (-rt, i) }.take(64)
      .map { case (_, i, rt) => (i, rt) }.toSet
    assert(kept.toSet == expected)
  }
}
