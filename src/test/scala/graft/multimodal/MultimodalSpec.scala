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

  test("resizeMeta preserves aspect ratio and never upscales") {
    val r = Multimodal.resizeMeta(Multimodal.mediaTable(spark, sfDir), 320, 240)
      .select($"width", $"height", $"out_w", $"out_h")
      .as[(Int, Int, Int, Int)].collect()
    r.foreach { case (w, h, ow, oh) =>
      assert(ow <= 320 && oh <= 240 && ow <= w && oh <= h)
    }
  }
}
