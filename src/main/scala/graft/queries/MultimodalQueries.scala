package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.multimodal.Multimodal

/** Oracle-checked faces of the multimodal plumbing (graft.multimodal):
  * metadata extraction + declarative resize, and video frame sampling.
  * The stubbed decode stage (mapPartitions batch map) is covered by
  * MultimodalSpec instead — a codec isn't SQL.
  */
object MultimodalQueries {

  private def h32Sql(s: String): String = OracleSql.h32(s)

  /** Binary payload metadata + resize planning, payload never decoded
    * (column pruning keeps the scan metadata-only). */
  val mediaMeta = Q(
    "q41_media_meta",
    (s, d) =>
      Multimodal.resizeMeta(Multimodal.mediaTable(s, d), 320, 240)
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"), col("out_w"), col("out_h"))
        .orderBy(col("media_id")),
    Some {
      val h = h32Sql("text")
      s"""WITH m AS (
            SELECT doc_id AS media_id,
              ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
              CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
              CAST($h % 640 + 1 AS INT) AS width,
              CAST(($h // 640) % 480 + 1 AS INT) AS height
            FROM documents)
          SELECT media_id, kind, n_bytes, width, height,
            CAST(floor(width * least(320.0 / width, 240.0 / height, 1.0)) AS INT) AS out_w,
            CAST(floor(height * least(320.0 / width, 240.0 / height, 1.0)) AS INT) AS out_h
          FROM m ORDER BY media_id"""
    }
  )

  /** Frame sampling: every 4th frame of each video's fake frame count
    * (generator/explode shape over binary-column metadata). */
  val frameSample = Q(
    "q42_frame_sample",
    (s, d) =>
      Multimodal.sampleFrames(Multimodal.mediaTable(s, d), 4)
        .select(col("media_id"), col("n_frames").cast("long").as("n_frames"),
          col("frame_no").cast("long").as("frame_no"))
        .orderBy(col("media_id"), col("frame_no")),
    Some("""WITH v AS (
             SELECT doc_id AS media_id,
               CAST(octet_length(CAST(text AS BLOB)) % 120 + 1 AS BIGINT) AS n_frames
             FROM documents WHERE doc_id % 3 = 2)
           SELECT media_id, n_frames,
             CAST(unnest(range(0, n_frames, 4)) AS BIGINT) AS frame_no
           FROM v ORDER BY media_id, frame_no""")
  )

  val all: Seq[Q] = Seq(mediaMeta, frameSample)
}
