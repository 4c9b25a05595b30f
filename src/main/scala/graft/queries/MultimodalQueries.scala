package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.multimodal.Multimodal

/** Oracle-checked faces of the multimodal plumbing (graft.multimodal):
  * metadata extraction + declarative resize, video frame sampling, and
  * the synth→parse round trips through the REAL codecs (WAV headers
  * q115, PCM samples q124, MP4 boxes q123, video frame pixels q134).
  * The feature-vector decode stage (mapPartitions batch map) is covered
  * by MultimodalSpec instead — a float feature isn't SQL.
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

  /** REAL audio metadata decode (q41's family, VERDICT r9 item 7 —
    * audio was the remaining deterministic stub while images decode
    * pixel-exactly): for every audio row, synthesize a valid PCM
    * RIFF/WAVE payload whose parameters (sample rate, channels, sample
    * count) derive from the document hash, then PARSE those fields back
    * out of the BYTES with [[Multimodal.wavMeta]] — chunk walk,
    * little-endian `fmt ` fields, `data`-size-derived sample count and
    * duration. The oracle computes the same closed form from the hash
    * directly, so what DuckDB certifies is that the synth→parse round
    * trip through a real RIFF parser is the identity on every field —
    * the parser is additionally cross-checked against the JDK's own
    * `javax.sound.sampled` reader in MultimodalSpec. Payload bytes
    * never leave the executors (mapPartitions batch shape, as the
    * decode stage). */
  val audioMeta = Q(
    "q115_audio_meta",
    (s, d) => {
      import s.implicits._
      val h = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
      graft.Tables.documents(s, d)
        .where(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"),
          element_at(array(lit(8000), lit(16000), lit(22050), lit(44100)),
            (h % 4 + 1).cast("int")).as("sr"),
          (h % 2 + 1).cast("int").as("ch"),
          (length(col("text").cast("binary")) % 1000 + 1).cast("int").as("ns"))
        .as[(Long, Int, Int, Int)]
        .mapPartitions(_.map { case (id, sr, ch, ns) =>
          val m = Multimodal
            .wavMeta(Multimodal.wavBytes(sr, ch, 16, ns, seed = id))
            .getOrElse(sys.error(s"unparseable synthesized WAV for $id"))
          (id, m.audio_format, m.channels, m.sample_rate,
            m.bits_per_sample, m.n_samples, m.duration_ms)
        })
        .toDF("media_id", "audio_format", "channels", "sample_rate",
          "bits_per_sample", "n_samples", "duration_ms")
        .orderBy(col("media_id"))
    },
    Some {
      val h = h32Sql("text")
      s"""WITH a AS (
            SELECT doc_id AS media_id,
              [8000,16000,22050,44100][CAST($h % 4 + 1 AS INT)] AS sample_rate,
              CAST($h % 2 + 1 AS INT) AS channels,
              CAST(octet_length(CAST(text AS BLOB)) % 1000 + 1 AS BIGINT)
                AS n_samples
            FROM documents WHERE doc_id % 3 = 1)
          SELECT media_id, 1 AS audio_format, channels, sample_rate,
            16 AS bits_per_sample, n_samples,
            n_samples * 1000 // sample_rate AS duration_ms
          FROM a ORDER BY media_id"""
    }
  )

  /** REAL video metadata decode (q115's video sibling, closing the last
    * metadata stub): for every video row, synthesize a valid ISO-BMFF
    * MP4 payload — ftyp/mdat/moov with nested trak/mdia/stbl boxes —
    * whose parameters (timescale, duration ticks, dimensions, stts
    * frame count) derive from the document hash, then PARSE those
    * fields back out of the BYTES with [[Multimodal.mp4Meta]]'s
    * recursive box walk (big-endian sizes, 16.16 fixed-point dims).
    * The synthesized dims are q41's `mediaTable` dims and the stts
    * count is q42's `n_bytes % 120 + 1` frame count, so the fake
    * metadata those queries plan over is now certified re-derivable
    * from a real container format. The oracle computes the same closed
    * form from the hash directly: DuckDB certifies the synth→parse
    * round trip through a real MP4 parser is the identity on every
    * field. Payload bytes never leave the executors. */
  val videoMeta = Q(
    "q123_video_meta",
    (s, d) => {
      import s.implicits._
      val h = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
      graft.Tables.documents(s, d)
        .where(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("media_id"),
          element_at(array(lit(600), lit(1000), lit(24000), lit(90000)),
            (h % 4 + 1).cast("int")).as("ts"),
          length(col("text").cast("binary")).cast("long").as("n_bytes"),
          (h % 640 + 1).cast("int").as("w"),
          (floor(h / 640) % 480 + 1).cast("int").as("ht"))
        .as[(Long, Int, Long, Int, Int)]
        .mapPartitions(_.map { case (id, ts, nBytes, w, ht) =>
          val m = Multimodal.mp4Meta(Multimodal.mp4Bytes(ts,
              durationTicks = (nBytes % 5000 + ts).toInt, width = w,
              height = ht, nFrames = (nBytes % 120 + 1).toInt, seed = id))
            .getOrElse(sys.error(s"unparseable synthesized MP4 for $id"))
          (id, m.brand, m.timescale, m.duration_ms, m.track_id,
            m.width, m.height, m.n_frames)
        })
        .toDF("media_id", "brand", "timescale", "duration_ms", "track_id",
          "width", "height", "n_frames")
        .orderBy(col("media_id"))
    },
    Some {
      val h = h32Sql("text")
      s"""WITH v AS (
            SELECT doc_id AS media_id,
              [600,1000,24000,90000][CAST($h % 4 + 1 AS INT)] AS timescale,
              CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
              CAST($h % 640 + 1 AS INT) AS width,
              CAST(($h // 640) % 480 + 1 AS INT) AS height
            FROM documents WHERE doc_id % 3 = 2)
          SELECT media_id, 'isom' AS brand, timescale,
            (n_bytes % 5000 + timescale) * 1000 // timescale AS duration_ms,
            1 AS track_id, width, height,
            n_bytes % 120 + 1 AS n_frames
          FROM v ORDER BY media_id"""
    }
  )

  /** REAL audio SAMPLE decode (VERDICT r10 item 4 — held rounds 10–19
    * as the one synthetic-sample face closable pure-JVM; q134 has since
    * closed the video one too): for every audio row,
    * synthesize interleaved 16-bit PCM samples from a closed form both
    * engines can state (`((id·40503 + i·2654435761) mod 2^16) − 2^15`,
    * exact in 64-bit integers), write them through
    * [[Multimodal.wavBytesPcm]] into a REAL RIFF/WAVE payload, then
    * decode every little-endian frame back out of the BYTES with
    * [[Multimodal.wavPcmStats]] and fold per-channel amplitude stats
    * (min/max/RMS). The oracle computes the same stats from the closed
    * form directly, so DuckDB certifies that byte-level PCM
    * encode→decode is the identity on every sample — q115 certified the
    * headers; this certifies the sample data. RMS is exact-integer
    * sum-of-squares then one sqrt, so the doubles are bit-identical
    * cross-engine (rounded to 6dp by the shared convention anyway).
    * Payload bytes never leave the executors. */
  val audioPcm = Q(
    "q124_audio_pcm",
    (s, d) => {
      import s.implicits._
      val h = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
      graft.Tables.documents(s, d)
        .where(col("doc_id") % 3 === 1)
        .select(col("doc_id").as("media_id"),
          element_at(array(lit(8000), lit(16000), lit(22050), lit(44100)),
            (h % 4 + 1).cast("int")).as("sr"),
          (h % 2 + 1).cast("int").as("ch"),
          (length(col("text").cast("binary")) % 1000 + 1).cast("int").as("ns"))
        .as[(Long, Int, Int, Int)]
        .flatMap { case (id, sr, ch, ns) =>
          val samples = Array.tabulate(ns * ch) { i =>
            (((id * 40503L + i * 2654435761L) % 65536L) - 32768L).toShort
          }
          Multimodal.wavPcmStats(Multimodal.wavBytesPcm(sr, ch, samples))
            .getOrElse(sys.error(s"undecodable synthesized PCM WAV for $id"))
            .map(cs => (id, cs.channel, cs.n_frames, cs.s_min, cs.s_max, cs.rms))
        }
        .toDF("media_id", "channel", "n_frames", "s_min", "s_max", "rms")
        .withColumn("rms", round(col("rms"), 6))
        .orderBy(col("media_id"), col("channel"))
    },
    Some {
      val h = h32Sql("text")
      s"""WITH a AS (
            SELECT doc_id AS media_id,
              CAST($h % 2 + 1 AS BIGINT) AS ch,
              CAST(octet_length(CAST(text AS BLOB)) % 1000 + 1 AS BIGINT) AS ns
            FROM documents WHERE doc_id % 3 = 1),
          g AS (
            SELECT media_id, ch,
              CAST(unnest(range(0, ns * ch)) AS BIGINT) AS i
            FROM a),
          v AS (
            SELECT media_id, CAST(i % ch AS INT) AS channel,
              ((media_id * 40503 + i * 2654435761) % 65536) - 32768 AS v
            FROM g)
          SELECT media_id, channel, count(*) AS n_frames,
            CAST(min(v) AS INT) AS s_min, CAST(max(v) AS INT) AS s_max,
            round(sqrt(sum(v * v) / count(*)), 6) AS rms
          FROM v GROUP BY media_id, channel ORDER BY media_id, channel"""
    }
  )

  /** REAL video FRAME-PIXEL decode (q124's video sibling — the last
    * synthetic media face, held rounds 9–19 as "no codecs in-container":
    * closable after all, because ISO-BMFF frame LOCATION is a byte walk
    * and the JDK's own `javax.imageio` IS a real codec for the
    * intra-coded MJPEG family). For every video row, synthesize real
    * PNG-coded frames — solid color per frame from a closed form both
    * engines can state — mux them into a REAL ISO-BMFF payload with a
    * full sample table ([[graft.multimodal.Multimodal.mp4BytesFrames]]:
    * stsd/stts/stsc/stsz/stco; samples-per-chunk varies by doc so the
    * multi-chunk stsc walk is on the gated path), then decode the BYTES
    * back: [[graft.multimodal.Multimodal.mp4Frames]] runs the player's
    * sample-location algorithm and every frame decodes through ImageIO.
    * Emitted fields all come from the DECODED pixels — frame dims from
    * the decoder, r/g/b from pixel (0,0), and `rgb_sum` as the exact
    * integer sum of all three channels over EVERY pixel (a full-frame
    * loop: one wrong pixel anywhere breaks the hash). PNG is lossless,
    * so the oracle states the same values in closed form from doc_id —
    * DuckDB certifies that frame mux → sample-table walk → real image
    * decode is the identity on every pixel. Payload bytes never leave
    * the executors. */
  val videoFrames = Q(
    "q134_video_frames",
    (s, d) => {
      import s.implicits._
      graft.Tables.documents(s, d)
        .where(col("doc_id") % 3 === 2)
        .select(col("doc_id"))
        .as[Long]
        .flatMap { id =>
          val nf = (id % 4 + 2).toInt
          val w = (id % 24 + 8).toInt
          val ht = (id % 16 + 8).toInt
          val frames = (0 until nf).map { f =>
            val rgb = ((((id * 7 + f * 29) % 256) << 16) |
              (((id * 11 + f * 31) % 256) << 8) |
              ((id * 13 + f * 37) % 256)).toInt
            val img = new java.awt.image.BufferedImage(w, ht,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            for (y <- 0 until ht; x <- 0 until w) img.setRGB(x, y, rgb)
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", buf)
            buf.toByteArray
          }
          val payload = Multimodal.mp4BytesFrames(timescale = 600,
            durationTicks = nf * 100, width = w, height = ht, frames,
            samplesPerChunk = (id % 3 + 1).toInt)
          Multimodal.mp4Frames(payload)
            .getOrElse(sys.error(s"unlocatable synthesized frames for $id"))
            .zipWithIndex.map { case (fb, f) =>
              val img = javax.imageio.ImageIO
                .read(new java.io.ByteArrayInputStream(fb))
              if (img == null) sys.error(s"undecodable frame $f of video $id")
              val p0 = img.getRGB(0, 0)
              var sum = 0L
              for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
                val p = img.getRGB(x, y)
                sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
              }
              (id, f.toLong, img.getWidth, img.getHeight,
                (p0 >> 16) & 0xff, (p0 >> 8) & 0xff, p0 & 0xff, sum)
            }
        }
        .toDF("media_id", "frame_no", "f_w", "f_h", "r", "g", "b", "rgb_sum")
        .orderBy(col("media_id"), col("frame_no"))
    },
    Some("""WITH v AS (
             SELECT doc_id AS media_id,
               CAST(doc_id % 4 + 2 AS BIGINT) AS nf,
               CAST(doc_id % 24 + 8 AS INT) AS w,
               CAST(doc_id % 16 + 8 AS INT) AS h
             FROM documents WHERE doc_id % 3 = 2),
           f AS (
             SELECT media_id, w, h,
               CAST(unnest(range(0, nf)) AS BIGINT) AS frame_no
             FROM v)
           SELECT media_id, frame_no, w AS f_w, h AS f_h,
             CAST((media_id * 7 + frame_no * 29) % 256 AS INT) AS r,
             CAST((media_id * 11 + frame_no * 31) % 256 AS INT) AS g,
             CAST((media_id * 13 + frame_no * 37) % 256 AS INT) AS b,
             (((media_id * 7 + frame_no * 29) % 256)
              + ((media_id * 11 + frame_no * 31) % 256)
              + ((media_id * 13 + frame_no * 37) % 256)) * w * h AS rgb_sum
           FROM f ORDER BY media_id, frame_no""")
  )

  val all: Seq[Q] = Seq(mediaMeta, frameSample, audioMeta, videoMeta,
    audioPcm, videoFrames)
}
