package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One decoded media item: opaque binary payload + typed metadata.
  * `pixels` is the decoded feature payload (stubbed — see [[Multimodal]]).
  */
case class MediaItem(media_id: Long, kind: String, n_bytes: Long,
    width: Int, height: Int)
case class DecodedMedia(media_id: Long, kind: String, width: Int, height: Int,
    pixels: Array[Float])

/** Multimodal-column plumbing (brief requirement): image/audio/video
  * carried as opaque `binary` columns with typed metadata, processed by
  * per-partition batch functions.
  *
  * The real Spark-side machinery — schema, partitioning, batch shape,
  * metadata extraction, frame sampling — is implemented and tested; the
  * actual codec step is STUBBED with a deterministic fake (this container
  * has no image/audio libraries): `decodePixels` synthesizes pixels from
  * the payload hash. Swap `decodePixels` for a real codec (e.g. javacpp
  * ffmpeg/imageio) without touching any plumbing.
  *
  * Scale notes: payloads stay in executor memory only one partition-batch
  * at a time (`mapPartitions`, no collect); metadata-only queries never
  * deserialize payload bytes (column pruning drops the binary column at
  * the parquet scan when untouched).
  */
object Multimodal {

  /** Synthetic media table derived deterministically from `documents`:
    * payload = utf8 bytes of text, kind cycles image/audio/video by
    * doc_id, fake dimensions derived from the content hash. */
  def mediaTable(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(col("payload")), 1, 8), 16, 10).cast("long")
    Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
      .withColumn("width", (h % 640 + 1).cast("int"))
      .withColumn("height", (floor(h / 640) % 480 + 1).cast("int"))
  }

  /** STUB codec: deterministic fake "decode" of a payload into a fixed
    * 8-float feature vector (hash-seeded). Real implementation would call
    * an image/audio codec here; the batch shape (one partition-iterator at
    * a time, bounded memory) is the part that matters for scale. */
  private[multimodal] def decodePixels(payload: Array[Byte]): Array[Float] = {
    var h = 1125899906842597L // deterministic FNV-ish fold, not a codec
    payload.foreach(b => h = h * 31 + b)
    Array.tabulate(8)(i => (((h >>> (i * 8)) & 0xff).toFloat) / 255.0f)
  }

  /** Decode stage as a typed per-partition batch map — the Scala analogue
    * of a `mapInPandas` batch UDF: payload bytes never leave the executor,
    * one partition streams at a time. */
  def decode(media: DataFrame): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("kind"), col("width"), col("height"),
        col("payload"))
      .as[(Long, String, Int, Int, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, w, h, payload) =>
        DecodedMedia(id, kind, w, h, decodePixels(payload))
      })
  }

  /** Declarative resize: metadata transform only (no payload touch). */
  def resizeMeta(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("scale",
        least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0)))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))
      .drop("scale")

  /** Frame sampling for video rows: every `step`-th frame index of a fake
    * frame count derived from payload size (generator/explode shape). */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media.where(col("kind") === "video")
      .withColumn("n_frames", (col("n_bytes") % 120 + 1).cast("int"))
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_no"))
}
