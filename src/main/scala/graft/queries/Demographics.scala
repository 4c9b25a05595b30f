package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.rec.Ratings

/** Demographic cohort analytics — the ml-1M user-dimension face of the
  * reference (users.dat carries gender/age/occupation, loaded by
  * `/root/reference/src/cypher/init-ml-1m.cypher:5`; a user of that graph
  * slices ratings by those cohorts).
  *
  * The fixture star schema has no demographic columns, so the user
  * dimension is synthesized DETERMINISTICALLY from `customer` (gender and
  * age band are pure functions of c_custkey, mirrored verbatim in the
  * oracle SQL) — the shape matches users.dat's coding (gender ∈ {M,F},
  * bucketed age bands) without inventing data the oracle can't reproduce.
  *
  * Scale shape: the demographic dimension is |users| rows (tiny next to
  * the ratings fact) and is explicitly `broadcast()` into the join, so
  * the cohort rollup is one shuffle on the grouping key — the same plan
  * at sf0.001 and at 100 TB.
  */
object Demographics {

  private def rview = Ratings.viewSql

  private val AgeBands =
    Seq("18-24", "25-34", "35-44", "45-54", "55+")

  /** Occupation coding after ml-1M users.dat (21 integer-coded
    * occupations; a representative named subset here, still a pure
    * function of c_custkey so the oracle mirrors it exactly). */
  private val Occupations =
    Seq("academic", "artist", "engineer", "farmer", "lawyer", "student",
      "writer")

  /** (user_id, gender, age_band, occupation) synthesized from customer. */
  private[queries] def userDim(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    val band = AgeBands.zipWithIndex.tail.foldLeft(
      when(k % 5 === 0, AgeBands.head)) {
      case (acc, (b, i)) => acc.when(k % 5 === i, b)
    }
    val occ = Occupations.zipWithIndex.tail.foldLeft(
      when(k % 7 === 0, Occupations.head)) {
      case (acc, (o, i)) => acc.when(k % 7 === i, o)
    }
    Tables.customer(s, d).select(
      k.as("user_id"),
      when(k % 2 === 0, "F").otherwise("M").as("gender"),
      band.as("age_band"),
      occ.as("occupation"))
  }

  /** Matching DuckDB CTE body for [[userDim]]. */
  private val userDimSql: String = {
    val cases = AgeBands.zipWithIndex
      .map { case (b, i) => s"WHEN $i THEN '$b'" }.mkString(" ")
    val occCases = Occupations.zipWithIndex
      .map { case (o, i) => s"WHEN $i THEN '$o'" }.mkString(" ")
    s"""SELECT c_custkey AS user_id,
        CASE WHEN c_custkey % 2 = 0 THEN 'F' ELSE 'M' END AS gender,
        CASE c_custkey % 5 $cases END AS age_band,
        CASE c_custkey % 7 $occCases END AS occupation
        FROM customer"""
  }

  /** Cohort rollup: rating volume, reach, and mean rating per
    * gender × age band (the "do cohorts rate differently" cut). */
  val cohortStats = Q(
    "q68_cohort_stats",
    (s, d) => {
      Ratings.view(s, d)
        .join(broadcast(userDim(s, d)), Seq("user_id"))
        .groupBy(col("gender"), col("age_band"))
        .agg(count(lit(1)).as("n_ratings"),
             countDistinct(col("user_id")).as("n_users"),
             round(avg(col("rating")), 6).as("avg_rating"))
        .orderBy(col("gender"), col("age_band"))
    },
    Some(s"""WITH r AS ($rview), u AS ($userDimSql)
            SELECT gender, age_band, count(*) AS n_ratings,
                   count(DISTINCT user_id) AS n_users,
                   round(avg(rating), 6) AS avg_rating
            FROM r JOIN u USING (user_id)
            GROUP BY 1, 2 ORDER BY gender, age_band""")
  )

  /** Top-3 items per cohort by rating count (the per-cohort popularity
    * ranking a recommender cold-starts from). Count-ordered with item_id
    * tiebreak — exact integers, so ordering is oracle-stable. */
  val cohortTopItems = Q(
    "q69_cohort_top_items",
    (s, d) => {
      val w = Window.partitionBy(col("gender"), col("age_band"))
        .orderBy(col("n").desc, col("item_id"))
      Ratings.view(s, d)
        .join(broadcast(userDim(s, d)), Seq("user_id"))
        .groupBy(col("gender"), col("age_band"), col("item_id"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .where(col("rank") <= 3)
        .orderBy(col("gender"), col("age_band"), col("rank"))
    },
    Some(s"""WITH r AS ($rview), u AS ($userDimSql),
            c AS (SELECT gender, age_band, item_id, count(*) AS n
                  FROM r JOIN u USING (user_id) GROUP BY 1, 2, 3)
            SELECT gender, age_band, item_id, n, rank FROM (
              SELECT *, row_number() OVER (PARTITION BY gender, age_band
                ORDER BY n DESC, item_id) AS rank FROM c) t
            WHERE rank <= 3 ORDER BY gender, age_band, rank""")
  )

  /** Occupation × gender rollup (the third users.dat dimension,
    * `/root/reference/src/cypher/init-ml-1m.cypher:5`): rating volume,
    * reach, and mean rating per occupation and gender — same
    * broadcast-dimension / single-shuffle plan as q68. */
  val occupationStats = Q(
    "q70_occupation_stats",
    (s, d) => {
      Ratings.view(s, d)
        .join(broadcast(userDim(s, d)), Seq("user_id"))
        .groupBy(col("occupation"), col("gender"))
        .agg(count(lit(1)).as("n_ratings"),
             countDistinct(col("user_id")).as("n_users"),
             round(avg(col("rating")), 6).as("avg_rating"))
        .orderBy(col("occupation"), col("gender"))
    },
    Some(s"""WITH r AS ($rview), u AS ($userDimSql)
            SELECT occupation, gender, count(*) AS n_ratings,
                   count(DISTINCT user_id) AS n_users,
                   round(avg(rating), 6) AS avg_rating
            FROM r JOIN u USING (user_id)
            GROUP BY 1, 2 ORDER BY occupation, gender""")
  )

  /** Cohort × TIME — the last untouched face combination: the reference
    * carries a timestamp on every rating
    * (`/root/reference/src/cypher/init_database.cypher:9`), so "how does
    * a cohort's rating volume move month over month" is a first-class
    * question. Here each rating EVENT (one per lineitem, not the
    * user-item average) carries its order date; the demographic
    * dimension broadcasts, the rollup is one shuffle on (gender,
    * age_band, month). Months travel as 'yyyy-MM' strings — exact
    * cross-engine, no date-codec ambiguity; rating events are integral
    * doubles so avg is order-independent. */
  val cohortMonthly = Q(
    "q84_cohort_monthly",
    (s, d) => {
      val re = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("user_id"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          (lit(1.0) + col("l_quantity") % 5).as("rating"))
      re.join(broadcast(userDim(s, d)), Seq("user_id"))
        .groupBy(col("gender"), col("age_band"), col("month"))
        .agg(count(lit(1)).as("n_ratings"),
             round(avg(col("rating")), 6).as("avg_rating"))
        .orderBy(col("gender"), col("age_band"), col("month"))
    },
    Some(s"""WITH u AS ($userDimSql),
            re AS (SELECT o_custkey AS user_id,
                     strftime(o_orderdate, '%Y-%m') AS month,
                     1.0 + (l_quantity % 5) AS rating
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
            SELECT gender, age_band, month, count(*) AS n_ratings,
                   round(avg(rating), 6) AS avg_rating
            FROM re JOIN u USING (user_id)
            GROUP BY 1, 2, 3 ORDER BY gender, age_band, month""")
  )

  val all: Seq[Q] = Seq(cohortStats, cohortTopItems, occupationStats,
    cohortMonthly)
}
