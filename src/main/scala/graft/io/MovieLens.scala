package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the reference's external file formats (SURVEY §2.1):
  * headerless TSV ratings (`u.data`, ref parse `/root/reference/src/als/
  * spark_als.py:43-70`), `::`-separated ml-1M/10M `.dat` files
  * (`ratings.dat`, `movies.dat`, `users.dat`; ref `doc/课程报告.md:466`),
  * tags (`init_database.cypher:11`), and the crawler's `::`-CSV outputs
  * (`src/crawler/crawler.py:12,17`).
  *
  * All readers declare explicit StructTypes (nothing inferred — SURVEY
  * §1.3 fixes the reference's implicit schemas) and go straight to
  * DataFrames: no RDD layer, so pushdown/pruning work and the same code
  * scales from one file to a partitioned directory tree.
  */
object MovieLens {

  val ratingSchema: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("movie_id", IntegerType, nullable = false),
    StructField("rating", DoubleType, nullable = false),
    StructField("timestamp", LongType, nullable = false)))

  val movieSchema: StructType = StructType(Seq(
    StructField("movie_id", IntegerType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("genres", StringType, nullable = true)))

  val userSchema: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("gender", StringType, nullable = true),
    StructField("age", IntegerType, nullable = true),
    StructField("occupation", IntegerType, nullable = true),
    StructField("zip_code", StringType, nullable = true)))

  val tagSchema: StructType = StructType(Seq(
    StructField("user_id", IntegerType, nullable = false),
    StructField("movie_id", IntegerType, nullable = false),
    StructField("tag", StringType, nullable = true),
    StructField("timestamp", LongType, nullable = false)))

  /** S1: headerless tab-separated ratings (`u.data`). */
  def readRatingsTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ratingSchema).option("sep", "\t").csv(path)

  /** S9: `::`-separated ratings (`ratings.dat`). */
  def readRatingsDat(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(ratingSchema).option("sep", "::").csv(path)

  /** `movies.dat`: id::title::genres, with the genre list packed as a
    * `|`-separated string (split with [[genresArray]]). */
  def readMoviesDat(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(movieSchema).option("sep", "::").csv(path)

  /** `users.dat` (ml-1M demographics, ref `init-ml-1m.cypher:5`). */
  def readUsersDat(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(userSchema).option("sep", "::").csv(path)

  /** `tags.dat` (ml-10M). */
  def readTagsDat(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(tagSchema).option("sep", "::").csv(path)

  /** S10: crawler outputs, `::`-separated WITH header
    * (`people::movie_name::score` / `movie_name::tags`). */
  def readCrawlerCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "::").option("header", "true").csv(path)

  /** Packed `A|B|C` genre string → `array<string>` (F1 split; the multi-
    * hot encoding is `GraftFunctions.multiHot`). */
  def genresArray(genres: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    split(genres, "\\|")

  /** The reference's 18-genre vocabulary (ref `src/streaming/
    * streaming_rec.py:203-222`). */
  val genreVocab: Seq[String] = Seq(
    "Action", "Adventure", "Animation", "Children's", "Comedy", "Crime",
    "Documentary", "Drama", "Fantasy", "Film-Noir", "Horror", "Musical",
    "Mystery", "Romance", "Sci-Fi", "Thriller", "War", "Western")
}
