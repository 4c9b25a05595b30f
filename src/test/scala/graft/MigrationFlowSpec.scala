package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.io.{MovieLens, Upsert}
import graft.rec.AlsPipeline
import graft.stream.{StreamOps, UserInterest}

/** Capstone integration: the MIGRATION.md flows composed end to end on
  * literal MovieLens-format inputs — a reference user's batch pipeline
  * (§3.1: load → split → ALS → RMSE → top-k → upsert) and real-time
  * pipeline (§3.2: parse → enrich → state → top-N) on one engine.
  */
class MigrationFlowSpec extends SparkSpec {
  import spark.implicits._

  private def writeTmp(name: String, lines: Seq[String]): String = {
    val f = Files.createTempDirectory("graft-mig").resolve(name)
    Files.write(f, lines.mkString("\n").getBytes("UTF-8"))
    f.toString
  }

  test("batch flow: MovieLens files → ALS → recommendations table") {
    // tiny but dense rating matrix: 6 users × 5 movies
    val rnd = new scala.util.Random(5)
    val lines = for {
      u <- 1 to 6; m <- 1 to 5 if (u + m) % 3 != 0
    } yield s"$u\t$m\t${1 + rnd.nextInt(5)}\t${880000000 + u * 100 + m}"
    val ratingsPath = writeTmp("u.data", lines)
    val moviesPath = writeTmp("movies.dat", Seq(
      "1::Toy Story (1995)::Animation|Children's|Comedy",
      "2::Jumanji (1995)::Adventure|Children's|Fantasy",
      "3::Heat (1995)::Action|Crime|Thriller",
      "4::Casino (1995)::Drama",
      "5::Seven (1995)::Crime|Thriller"))

    val ratings = MovieLens.readRatingsTsv(spark, ratingsPath)
      .selectExpr("user_id", "movie_id AS item_id", "CAST(rating AS DOUBLE) AS rating")
      .cache()
    val movies = MovieLens.readMoviesDat(spark, moviesPath)

    // train + evaluate (§3.1)
    val Array(train, test) = ratings.randomSplit(Array(0.8, 0.2), seed = 42)
    val model = AlsPipeline.fit(train, rank = 4, maxIter = 5)
    val rmse = AlsPipeline.rmse(model, test)
    assert(!rmse.isNaN && rmse < 5.0)

    // serve top-2 unseen per user, join titles, upsert into the recs table
    val users = ratings.select($"user_id").distinct()
    val recs = AlsPipeline.recommendTopK(model, ratings, users, 2)
      .join(movies.selectExpr("movie_id AS item_id", "title"), Seq("item_id"))
    var table = Seq.empty[(Int, Int, Long, String)]
      .toDF("user_id", "item_id", "rank", "title")
    table = Upsert.merge(table,
      recs.select($"user_id", $"item_id", $"rank", $"title"),
      Seq("user_id", "rank"))
    val got = table.select($"user_id", $"item_id", $"rank", $"title")
      .as[(Int, Int, Long, String)].collect()
    assert(got.nonEmpty && got.forall(_._3 <= 2))
    // no recommended item was already rated (anti-join held through the flow)
    assert(table.join(ratings, Seq("user_id", "item_id")).count() == 0)

    // multi-hot features for the serving side (F6 with the real vocab)
    val hot = movies.select(
      GraftFunctions.multiHot($"genres", MovieLens.genreVocab).as("v"))
      .as[Seq[Int]].collect()
    assert(hot.head(MovieLens.genreVocab.indexOf("Children's")) == 1)
  }

  test("real-time flow: parse → enrich → interest state → top-N → upsert") {
    implicit val sc = spark.sqlContext
    val features = Seq(
      (1, Array(1.0, 0.0)), (2, Array(0.0, 1.0)), (3, Array(0.8, 0.6)))
      .toDF("itemId", "features")
    var recsTable = Seq.empty[(Int, Int, Long)].toDF("userId", "itemId", "rank")
    val in = MemoryStream[String]
    val q = StreamOps.interestStream(
        StreamOps.enrich(StreamOps.parseEvents(in.toDF()), features),
        dim = 2, lambda = 0.05)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserInterest], _: Long) =>
        val topN = StreamOps.topNForUsers(batch.toDF(), features, 2)
          .select(col("userId"), col("itemId"), col("rank"))
        recsTable = Upsert.merge(recsTable, topN, Seq("userId", "rank"))
          .localCheckpoint(true)
        ()
      }.start()
    in.addData("1 1 5.0 100", "2 2 5.0 100")
    q.processAllAvailable()
    q.stop()
    val byUser = recsTable.select($"userId", $"itemId", $"rank")
      .as[(Int, Int, Long)].collect()
      .groupBy(_._1).map { case (u, rs) => u -> rs.minBy(_._3)._2 }
    assert(byUser(1) == 1) // user 1's interest points at item 1
    assert(byUser(2) == 2)
  }
}
