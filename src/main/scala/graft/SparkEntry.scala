package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain catalogs (each a
  * `Seq[Q]`); a `Q` pairs the Spark pipeline with its DuckDB oracle SQL
  * so the two can never drift apart in separate maps.
  */
object SparkEntry {

  /** Every implemented operator from SURVEY.md §2, by name. */
  val catalog: Seq[Q] =
    _root_.graft.queries.Relational.all ++
    _root_.graft.queries.Similarity.all ++
    _root_.graft.queries.TextOps.all ++
    _root_.graft.queries.Recommender.all ++
    _root_.graft.queries.EventsQueries.all ++
    _root_.graft.queries.MultimodalQueries.all ++
    _root_.graft.queries.Analytics.all ++
    _root_.graft.queries.TpchShapes.all ++
    _root_.graft.queries.Demographics.all ++
    _root_.graft.queries.CypherQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Cold-start popularity (SURVEY §7.2 slice 0): scan→agg→having→sort→limit.
    */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.popularParts.run(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
