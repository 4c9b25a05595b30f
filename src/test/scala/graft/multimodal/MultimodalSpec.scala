package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, sfDir).cache()
    val kinds = m.select($"kind").distinct().as[String].collect().sorted
    assert(kinds.toSeq == Seq("audio", "image", "video"))
    val row = m.where($"media_id" === 0)
      .select($"n_bytes", $"width", $"height").head()
    assert(row.getLong(0) > 0 && row.getInt(1) >= 1 && row.getInt(1) <= 640)
    // payload is the utf8 text bytes (deterministic, no codec involved)
    val payload = m.where($"media_id" === 0).select($"payload")
      .as[Array[Byte]].head()
    val text = graft.Tables.documents(spark, sfDir)
      .where($"doc_id" === 0).select($"text").as[String].head()
    assert(new String(payload, "UTF-8") == text)
  }

  test("decode stage is deterministic, batch-shaped, and bounded") {
    val m = Multimodal.mediaTable(spark, sfDir)
    val d1 = Multimodal.decode(m).collect().sortBy(_.media_id)
    val d2 = Multimodal.decode(m.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.length == m.count())
    assert(d1.forall(_.pixels.length == 8))
    assert(d1.forall(_.pixels.forall(p => p >= 0.0f && p <= 1.0f)))
    // partitioning must not change decoded values
    d1.zip(d2).foreach { case (a, b) =>
      assert(a.media_id == b.media_id && a.pixels.sameElements(b.pixels))
    }
  }

  test("image kind decodes a real PNG via javax.imageio") {
    // 4×4 PNG, one solid color per quadrant: red, green, blue, white
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) {
      val c = (y / 2, x / 2) match {
        case (0, 0) => 0xff0000
        case (0, 1) => 0x00ff00
        case (1, 0) => 0x0000ff
        case _      => 0xffffff
      }
      img.setRGB(x, y, c)
    }
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val media = Seq((0L, "image", 4, 4, png))
      .toDF("media_id", "kind", "width", "height", "payload")
    val px = Multimodal.decode(media).collect().head.pixels
    def close(a: Float, b: Double) = math.abs(a - b) < 1e-3
    // overall means: each channel is 255 in exactly half the pixels
    assert(close(px(0), 0.5) && close(px(1), 0.5) && close(px(2), 0.5))
    // quadrant grays: single-channel quads → 1/3, white quad → 1
    assert(close(px(3), 1.0 / 3) && close(px(4), 1.0 / 3) &&
      close(px(5), 1.0 / 3) && close(px(6), 1.0))
    assert(px(7) == 1.0f) // square aspect
    // and a payload no ImageReader accepts falls back to the stub
    val junk = "not an image".getBytes("UTF-8")
    val viaDecode = Multimodal.decodePixels("image", junk)
    assert(viaDecode.sameElements(Multimodal.stubPixels(junk)))
  }

  test("wavMeta parses a real RIFF/WAVE payload, agreeing with the JDK reader") {
    val bytes = Multimodal.wavBytes(sampleRate = 44100, channels = 2,
      bitsPerSample = 16, nSamples = 441, seed = 7L)
    val m = Multimodal.wavMeta(bytes).get
    assert(m == WavMeta(audio_format = 1, channels = 2, sample_rate = 44100,
      bits_per_sample = 16, n_samples = 441L, duration_ms = 10L))

    // independent cross-check: the JDK's own javax.sound.sampled WAV
    // reader must agree on every field it exposes
    val jdk = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    assert(jdk.getFormat.getSampleRate == 44100f)
    assert(jdk.getFormat.getChannels == 2)
    assert(jdk.getFormat.getSampleSizeInBits == 16)
    assert(jdk.getFrameLength == 441)

    // mono at a different rate: duration uses integer ms (flooring)
    val mono = Multimodal.wavMeta(
      Multimodal.wavBytes(8000, 1, 16, 12345, seed = 1L)).get
    assert(mono.channels == 1 && mono.sample_rate == 8000)
    assert(mono.n_samples == 12345L && mono.duration_ms == 1543L) // 1543.125
  }

  test("wavMeta rejects malformed payloads instead of failing the batch") {
    assert(Multimodal.wavMeta(Array.emptyByteArray).isEmpty)
    assert(Multimodal.wavMeta("RIFFxxxxNOPE".getBytes("US-ASCII")).isEmpty)
    val good = Multimodal.wavBytes(16000, 1, 16, 10, seed = 2L)
    assert(Multimodal.wavMeta(good.take(20)).isEmpty) // truncated mid-header
    // a data chunk but no fmt chunk is not a decodable WAV
    val noFmt = java.nio.ByteBuffer.allocate(20)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(12)
      .put("WAVE".getBytes("US-ASCII"))
      .put("data".getBytes("US-ASCII")).putInt(0).array()
    assert(Multimodal.wavMeta(noFmt).isEmpty)
    // unsigned 32-bit chunk sizes near 2^32: an Int truncation would make
    // the walk stall (0xFFFFFFF8 → advance 0) or seek backwards — these
    // must terminate and return None, not loop or throw
    val good16 = Multimodal.wavBytes(16000, 1, 16, 10, seed = 3L)
    for (evil <- Seq(0xFFFFFFF8, 0xFFFFFFFF, 0x80000000, Int.MaxValue)) {
      val hostile = good16.clone()
      java.nio.ByteBuffer.wrap(hostile)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(16, evil) // declared fmt-chunk size overruns the payload
      assert(Multimodal.wavMeta(hostile).isEmpty)
      val hostileData = good16.clone()
      java.nio.ByteBuffer.wrap(hostileData)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(40, evil) // declared data-chunk size overruns the payload
      assert(Multimodal.wavMeta(hostileData).isEmpty)
    }
  }

  test("wavPcmStats decodes 16-bit PCM frames back to per-channel stats") {
    // stereo: channel 0 is a known ramp, channel 1 a known constant —
    // min/max/rms all computable by hand
    val frames = Array.tabulate(4)(f => Array((f * 100 - 150).toShort, 1000.toShort))
    val bytes = Multimodal.wavBytesPcm(8000, 2, frames.flatten)
    val st = Multimodal.wavPcmStats(bytes).get
    assert(st.length == 2)
    val c0 = st(0); val c1 = st(1)
    assert(c0 == WavChannelStats(0, 4, -150, 150,
      math.sqrt((150.0 * 150 + 50 * 50 + 50 * 50 + 150 * 150) / 4)))
    assert(c1 == WavChannelStats(1, 4, 1000, 1000, 1000.0))

    // byte-level: flipping one sample byte changes exactly that channel
    val tweaked = bytes.clone()
    tweaked(44) = (tweaked(44) ^ 0xff).toByte // frame 0, channel 0, low byte
    val st2 = Multimodal.wavPcmStats(tweaked).get
    assert(st2(1) == c1 && st2(0) != c0)

    // the LCG fixture agrees with an independent replay of the generator
    val lcg = Multimodal.wavBytes(16000, 2, 16, 100, seed = 9L)
    val stLcg = Multimodal.wavPcmStats(lcg).get
    var s = 9L
    val replay = Array.fill(200) {
      s = s * 6364136223846793005L + 1442695040888963407L; (s >>> 48).toShort
    }
    for (c <- 0 to 1) {
      val ch = replay.zipWithIndex.collect { case (v, i) if i % 2 == c => v.toInt }
      assert(stLcg(c).s_min == ch.min && stLcg(c).s_max == ch.max)
      assert(math.abs(stLcg(c).rms -
        math.sqrt(ch.map(v => v.toLong * v).sum.toDouble / 100)) == 0.0)
    }

    // malformed / non-PCM payloads decode to None, not errors
    assert(Multimodal.wavPcmStats(Array.emptyByteArray).isEmpty)
    assert(Multimodal.wavPcmStats(bytes.take(50)).isEmpty) // truncated data
    val notPcm = bytes.clone()
    java.nio.ByteBuffer.wrap(notPcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(20, 3) // audio_format = IEEE float, not PCM
    assert(Multimodal.wavPcmStats(notPcm).isEmpty)
    val zeroFrames = Multimodal.wavBytesPcm(8000, 1, Array.empty[Short])
    assert(Multimodal.wavPcmStats(zeroFrames).isEmpty) // nothing to certify
  }

  test("mp4Meta parses a real ISO-BMFF payload back to its parameters") {
    val bytes = Multimodal.mp4Bytes(timescale = 90000, durationTicks = 180000,
      width = 640, height = 480, nFrames = 48, seed = 7L)
    assert(Multimodal.mp4Meta(bytes).contains(Mp4Meta(brand = "isom",
      timescale = 90000, duration_ms = 2000L, track_id = 1,
      width = 640, height = 480, n_frames = 48L)))

    // structural invariants of the writer: ftyp leads, box sizes tile
    // the payload exactly (the property the parser's walk relies on)
    assert(new String(bytes, 4, 4, "US-ASCII") == "ftyp")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    var pos = 0
    val top = Seq.newBuilder[String]
    while (pos < bytes.length) {
      top += new String(bytes, pos + 4, 4, "US-ASCII")
      pos += buf.getInt(pos)
    }
    assert(pos == bytes.length)
    assert(top.result() == Seq("ftyp", "mdat", "moov"))

    // duration uses integer ms (flooring), as the WAV path does
    val m = Multimodal.mp4Meta(
      Multimodal.mp4Bytes(600, 1543, 320, 240, nFrames = 1, seed = 1L)).get
    assert(m.duration_ms == 2571L) // 1543/600 s = 2571.66... ms
  }

  test("mp4Meta rejects malformed payloads instead of failing the batch") {
    assert(Multimodal.mp4Meta(Array.emptyByteArray).isEmpty)
    // text bytes (what a wrongly-tagged row would carry) are not boxes
    assert(Multimodal.mp4Meta("plain text, not a video".getBytes).isEmpty)
    val good = Multimodal.mp4Bytes(1000, 5000, 64, 64, nFrames = 5, seed = 2L)
    assert(Multimodal.mp4Meta(good.take(40)).isEmpty) // truncated mid-mdat
    // a box whose declared size overruns the payload is malformed, not
    // an out-of-bounds read
    val overrun = good.clone()
    java.nio.ByteBuffer.wrap(overrun).putInt(0, good.length * 2)
    assert(Multimodal.mp4Meta(overrun).isEmpty)
    // ftyp alone (no moov) has no metadata to certify
    assert(Multimodal.mp4Meta(good.take(24)).isEmpty)
  }

  // -- real video frame decode (q134's surfaces) ----------------------

  /** Deterministic PNG test frame: a horizontal two-band pattern (top
    * half one color, bottom half another) so a decode that found the
    * right bytes but the wrong layout cannot pass. */
  private def pngFrame(w: Int, h: Int, top: Int, bottom: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (y * 2 < h) top else bottom)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    buf.toByteArray
  }

  test("mp4BytesFrames → mp4Frames is the identity on coded frame bytes") {
    val frames = (0 until 5).map(f => pngFrame(6, 4, 0x102030 * (f + 1), 0xfff - f))
    // single chunk and multi-chunk (spc 2 → stsc carries a trailing-rest
    // run: chunks of 2, 2, 1) must both locate every frame byte-exactly
    for (spc <- Seq(Int.MaxValue, 2, 1, 3)) {
      val payload = Multimodal.mp4BytesFrames(600, 500, 6, 4, frames,
        samplesPerChunk = spc)
      val back = Multimodal.mp4Frames(payload).get
      assert(back.length == frames.length, s"spc=$spc")
      back.zip(frames).foreach { case (b, f) =>
        assert(java.util.Arrays.equals(b, f), s"spc=$spc")
      }
    }
    // and the container is still a well-formed mp4Meta file: same brand/
    // dims/stts frame count contract as the mdat-only writer
    val m = Multimodal.mp4Meta(
      Multimodal.mp4BytesFrames(600, 1200, 6, 4, frames, 2)).get
    assert(m == Mp4Meta("isom", 600, 2000L, 1, 6, 4, 5L))
  }

  test("video frames decode to real pixels via the sample table + ImageIO") {
    // two-band frames: decoded features must see BOTH bands (quadrant
    // means differ top vs bottom), proving real pixel decode not byte
    // hashing
    val frames = Seq(pngFrame(8, 8, 0xff0000, 0x0000ff),
      pngFrame(8, 8, 0xff0000, 0x0000ff))
    val payload = Multimodal.mp4BytesFrames(600, 200, 8, 8, frames)
    val feats = Multimodal.videoFrameFeatures(payload).get
    assert(feats.length == 8)
    // mean R = mean B = 0.5 (red top half, blue bottom half), mean G = 0
    assert(math.abs(feats(0) - 0.5f) < 1e-3 && math.abs(feats(2) - 0.5f) < 1e-3)
    assert(feats(1) == 0.0f)
    // top quadrants pure red (gray 1/3·255), bottom pure blue — equal
    // grays but the full-channel means above already separate the bands
    assert(math.abs(feats(3) - feats(5)) < 1e-6)
    // decodePixels dispatches video payloads to the real path...
    assert(Multimodal.decodePixels("video", payload).sameElements(feats))
    // true MJPEG (JPEG-coded samples, 'jpeg' 4CC): same walk, same
    // ImageIO dispatch, lossy codec — means land near the band values
    val jpegFrames = Seq.fill(2) {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, if (y < 8) 0xff0000 else 0x0000ff)
      val buf = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", buf)
      buf.toByteArray
    }
    val mjpeg = Multimodal.mp4BytesFrames(600, 200, 16, 16, jpegFrames,
      format = "jpeg")
    val jf = Multimodal.videoFrameFeatures(mjpeg).get
    assert(math.abs(jf(0) - 0.5f) < 0.1 && math.abs(jf(2) - 0.5f) < 0.1)
    assert(jf(1) < 0.2) // green stays near zero through JPEG loss
    // ...and non-container video bytes (the mediaTable's text payloads)
    // still fall back to the stub rather than failing the batch
    val text = "not a video".getBytes("UTF-8")
    assert(Multimodal.decodePixels("video", text)
      .sameElements(Multimodal.stubPixels(text)))
  }

  test("mp4FrameRanges rejects malformed sample tables instead of failing") {
    val frames = (0 until 3).map(f => pngFrame(4, 4, f * 0x111111, 0xffffff))
    val good = Multimodal.mp4BytesFrames(600, 300, 4, 4, frames, 2)
    assert(Multimodal.mp4FrameRanges(good).isDefined)
    assert(Multimodal.mp4FrameRanges(Array.emptyByteArray).isEmpty)
    assert(Multimodal.mp4FrameRanges("plain text".getBytes).isEmpty)
    // the mdat-only writer has no sample table — nothing to locate
    assert(Multimodal.mp4FrameRanges(
      Multimodal.mp4Bytes(600, 300, 4, 4, 3, seed = 1L)).isEmpty)
    // a chunk offset past the payload end must be rejected, not read
    def patched(boxId: String, fieldOff: Int, value: Int): Array[Byte] = {
      val p = good.clone()
      // find the box by scanning for its tag (unique in this payload)
      val idx = p.indices.find(i => i + 4 <= p.length - 4 &&
        new String(p, i, 4, "US-ASCII") == boxId).get
      java.nio.ByteBuffer.wrap(p).putInt(idx + fieldOff, value)
      p
    }
    // stco entry 0 (tag+4 ver/flags+4 count → +12) overruns the file
    assert(Multimodal.mp4FrameRanges(
      patched("stco", 12, good.length * 2)).isEmpty)
    // stsz sample 0 size (tag+4 ver/flags+4 uniform+4 count → +16)
    // hostile-huge: range would overrun the payload
    assert(Multimodal.mp4FrameRanges(patched("stsz", 16, 0x7fffffff)).isEmpty)
    // stsc first run starting at chunk 2 breaks the walk's contract
    assert(Multimodal.mp4FrameRanges(patched("stsc", 12, 2)).isEmpty)
    // sample-count inflated past what the chunks cover
    assert(Multimodal.mp4FrameRanges(patched("stsz", 12, 99)).isEmpty)
    // hostile UNIFORM-size stsz with a 2^31-class count must be
    // rejected before allocation (no OOM), not after
    val uniformHuge = patched("stsz", 8, 1) // uniform sample_size = 1
    java.nio.ByteBuffer.wrap(uniformHuge)
      .putInt(uniformHuge.indices.find(i => i + 4 <= uniformHuge.length &&
        new String(uniformHuge, i, 4, "US-ASCII") == "stsz").get + 12,
        0x7fffffff) // sample_count
    assert(Multimodal.mp4FrameRanges(uniformHuge).isEmpty)
  }

  test("resizeMeta preserves aspect ratio and never upscales") {
    val r = Multimodal.resizeMeta(Multimodal.mediaTable(spark, sfDir), 320, 240)
      .select($"width", $"height", $"out_w", $"out_h")
      .as[(Int, Int, Int, Int)].collect()
    r.foreach { case (w, h, ow, oh) =>
      assert(ow <= 320 && oh <= 240 && ow <= w && oh <= h)
    }
  }
}
