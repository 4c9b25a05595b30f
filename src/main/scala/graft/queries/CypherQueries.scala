package graft.queries

import org.apache.spark.sql.functions._

import graft.Q

/** The Cypher-compat execution path under the DRIVER's correctness gate:
  * these queries run LITERAL reference Cypher strings through
  * [[graft.cypher.CypherGraph]] and are hash-compared against DuckDB
  * oracles over the same parquet tables — so the parser, the pattern
  * executor, and the store construction are verified by the same
  * cross-engine machinery as every other catalog operator, not only by
  * specs. (CypherCompatSpec covers the full grammar; these two pin the
  * flagship read shapes.)
  */
object CypherQueries {

  /** The reference's headline data-load read (`spark_als.py:146-149`)
    * executed AS CYPHER — the ratings triple through the graph store
    * (post-sorted for the hash compare; Cypher result sets are
    * unordered without ORDER BY, exactly like SQL). */
  val cypherTriple = Q(
    "q121_cypher_triple",
    (s, d) => graft.cypher.MovieGraph(s, d)
      .read("MATCH (u:User)-[r:Rate]->(m:Movie) " +
        "RETURN u.UserID AS user_id, m.MovieID AS movie_id, " +
        "r.Rating AS rating")
      .orderBy(col("user_id"), col("movie_id")),
    Some(s"""SELECT user_id, item_id AS movie_id, rating
            FROM (${graft.rec.Ratings.viewSql}) rv
            ORDER BY user_id, movie_id""")
  )

  /** The report's dataset-statistics console queries
    * (`doc/课程报告.md:604-637`) as one row: user/movie/rating counts and
    * the mean rating, via THREE Cypher reads composed in one result —
    * global aggregates over node scans and an untyped-variable edge
    * match. Column names are the connector's literal headers. */
  val cypherStats = Q(
    "q122_cypher_stats",
    (s, d) => {
      val g = graft.cypher.MovieGraph(s, d)
      val nu = g.read("MATCH (u:User) RETURN COUNT(u);")
      val nm = g.read("MATCH (m:Movie) RETURN COUNT(m);")
      val nr = g.read("MATCH (User)-[r:Rate]->(Movie) RETURN COUNT(r);")
      val av = g.read("MATCH (User)-[r:Rate]->(Movie) RETURN AVG(r.Rating);")
      // 1-row crossJoin chain — q06's stats idiom, no driver action
      nu.crossJoin(nm).crossJoin(nr).crossJoin(av)
        .toDF("n_users", "n_movies", "n_ratings", "avg_raw")
        .select(col("n_users"), col("n_movies"), col("n_ratings"),
          round(col("avg_raw"), 6).as("avg_rating"))
    },
    Some(s"""SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
              CAST(count(DISTINCT item_id) AS BIGINT) AS n_movies,
              CAST(count(*) AS BIGINT) AS n_ratings,
              round(avg(rating), 6) AS avg_rating
            FROM (${graft.rec.Ratings.viewSql}) rv""")
  )

  val all: Seq[Q] = Seq(cypherTriple, cypherStats)
}
