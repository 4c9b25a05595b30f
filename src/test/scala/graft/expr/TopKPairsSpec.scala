package graft.expr

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q95's bounded-state ranking must be indistinguishable from the window
  * idiom it replaces — same ordering contract (score desc, id asc),
  * any partitioning, duplicates and ties included. */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  test("TopKPairs == row_number window ranking under any partitioning") {
    val k = 4
    // deterministic scores with heavy ties: score = i % 7
    val rows = (1 to 5000).map(i => ((i % 37).toLong, (i % 7).toDouble, i.toLong))
    val df = rows.toDF("key", "score", "id").repartition(11)

    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val windowed = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= k)
      .select($"key", $"id", $"score", $"rank".cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet

    val topk = TopKPairs.agg(k)
    val agged = df.groupBy($"key").agg(topk($"score", $"id").as("top"))
      .select($"key", posexplode($"top").as(Seq("pos", "p")))
      .select($"key", $"p._2", $"p._1", ($"pos" + 1).cast("long"))
      .as[(Long, Long, Double, Long)].collect().toSet

    assert(agged == windowed)
  }

  test("SQL surface: kmin_distinct64 and top3_pairs answer from plain SQL") {
    GraftFunctions.register(spark)
    Seq((1L, 3.0, 7L), (1L, 5.0, 2L), (1L, 5.0, 9L), (1L, 1.0, 4L))
      .toDF("key", "score", "id").createOrReplaceTempView("tp_sql")
    val top = spark.sql(
      "SELECT top3_pairs(score, id) AS t FROM tp_sql GROUP BY key")
      .selectExpr("transform(t, p -> p._2) AS ids")
      .as[Seq[Long]].head()
    assert(top == Seq(2L, 9L, 7L)) // 5.0@2, 5.0@9 (id tiebreak), 3.0@7
    val kmin = spark.sql("SELECT kmin_distinct64(id) AS m FROM tp_sql")
      .as[Seq[Long]].head()
    assert(kmin == Seq(2L, 4L, 7L, 9L))
  }

  test("TopKPairs ranks NaN largest, matching the window's ORDER BY DESC") {
    val k = 2
    val df = Seq((1L, 3.0, 7L), (1L, Double.NaN, 2L), (1L, 5.0, 9L),
        (1L, Double.NaN, 4L))
      .toDF("key", "score", "id").repartition(3)

    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val windowed = df.withColumn("rank", row_number().over(w))
      .where($"rank" <= k).orderBy($"rank")
      .select($"id").as[Long].collect().toSeq

    val topk = TopKPairs.agg(k)
    val agged = df.groupBy($"key").agg(topk($"score", $"id").as("top"))
      .select(explode($"top").as("p")).select($"p._2")
      .as[Long].collect().toSeq

    assert(windowed == Seq(2L, 4L)) // both NaNs outrank 5.0, id tiebreak
    assert(agged == windowed)
  }

  test("TopKPairs returns all pairs when a key has fewer than k") {
    val topk = TopKPairs.agg(10)
    val got = Seq((1L, 2.0, 7L), (1L, 3.0, 5L)).toDF("key", "score", "id")
      .groupBy($"key").agg(topk($"score", $"id").as("top"))
      .select(explode($"top").as("p")).select($"p._1", $"p._2")
      .as[(Double, Long)].collect().toSeq
    assert(got == Seq((3.0, 5L), (2.0, 7L)))
  }
}
