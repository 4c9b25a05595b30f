package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J4/Q8 MERGE semantics (ref Cypher `MERGE (u)-[:Recommend {Score}]->(m)`,
  * `/root/reference/src/csv/recommend.py:85-93`) without an external store:
  * keyed reconciliation of a recommendations table via full-outer join —
  * update wins on key collision, both sides' unmatched rows survive.
  * Idempotent: applying the same update twice is a no-op.
  *
  * At scale this is one shuffle on the merge key; with a Delta/Iceberg
  * sink the same logic is `MERGE INTO` and the write becomes transactional
  * — the plan shape is identical.
  */
object Upsert {

  def merge(existing: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    val valueCols = existing.columns.filterNot(keys.contains)
    require(valueCols.sameElements(updates.columns.filterNot(keys.contains)),
      "existing and updates must share the same schema")
    val e = existing.as("e")
    // presence sentinel: detects the update row even when its key columns
    // contain NULLs (key-nullness checks would wrongly let existing win)
    val u = updates.withColumn("__upd", lit(1)).as("u")
    val cond = keys.map(k => col(s"e.$k") <=> col(s"u.$k")).reduce(_ && _)
    e.join(u, cond, "full_outer")
      .select(
        keys.map(k =>
          when(col("u.__upd").isNotNull, col(s"u.$k")).otherwise(col(s"e.$k")).as(k)) ++
        valueCols.map { c =>
          when(col("u.__upd").isNotNull, col(s"u.$c")).otherwise(col(s"e.$c")).as(c)
        }: _*)
  }

  /** `remove_rec.cypher` equivalent: drop all recommendations for the
    * given users (rows with a NULL user are never targeted, so they are
    * kept — guards against NOT-IN three-valued-logic drops). */
  def deleteForUsers(recs: DataFrame, userIds: Seq[Int],
                     userCol: String = "user_id"): DataFrame =
    recs.where(col(userCol).isNull || !col(userCol).isInCollection(userIds))
}
