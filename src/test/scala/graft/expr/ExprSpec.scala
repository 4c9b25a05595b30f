package graft.expr

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExprSpec extends SparkSpec {
  import spark.implicits._

  private def cosRef(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  test("cosine_similarity matches reference impl on random vectors") {
    val rnd = new Random(42)
    val rows = Seq.fill(100) {
      (Array.fill(16)(rnd.nextDouble() * 2 - 1), Array.fill(16)(rnd.nextDouble() * 2 - 1))
    }
    val got = rows.toDF("a", "b")
      .select(GraftFunctions.cosineSimilarity($"a", $"b")).as[Double].collect()
    rows.zip(got).foreach { case ((a, b), g) =>
      assert(math.abs(g - cosRef(a, b)) < 1e-12)
    }
  }

  test("cosine_similarity properties: range, symmetry, self=1, zero/mismatch=null") {
    val rnd = new Random(7)
    val rows = Seq.fill(50) {
      (Array.fill(8)(rnd.nextDouble() * 10 - 5), Array.fill(8)(rnd.nextDouble() * 10 - 5))
    }
    val df = rows.toDF("a", "b")
    val res = df.select(
      GraftFunctions.cosineSimilarity($"a", $"b").as("ab"),
      GraftFunctions.cosineSimilarity($"b", $"a").as("ba"),
      GraftFunctions.cosineSimilarity($"a", $"a").as("aa"))
      .as[(Double, Double, Double)].collect()
    res.foreach { case (ab, ba, aa) =>
      assert(ab >= -1.0 - 1e-12 && ab <= 1.0 + 1e-12)
      assert(math.abs(ab - ba) < 1e-12)
      assert(math.abs(aa - 1.0) < 1e-12)
    }
    val nulls = Seq(
      (Array(0.0, 0.0), Array(1.0, 2.0)),   // zero norm
      (Array(1.0), Array(1.0, 2.0)))        // length mismatch
      .toDF("a", "b")
      .select(GraftFunctions.cosineSimilarity($"a", $"b"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("minhash_sig equals the explode/hash/groupBy composition") {
    val coefs = Array((3L, 7L), (11L, 13L), (101L, 997L), (65537L, 1L))
    val p = 2147483647L
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig_test", exprs => MinHashSig(exprs.head, 4, coefs, p),
      "built-in")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "aaaaaaa"),           // degenerate: one distinct shingle
      (4L, "abc"),               // too short: no shingles → null
      (5L, "héllo wörld ünïcode" * 3)) // non-ASCII code points
      .toDF("doc_id", "text")
    val viaExpr = docs
      .select($"doc_id", call_function("minhash_sig_test", $"text").as("sig"))
      .where($"sig".isNotNull)
      .as[(Long, Array[Long])].collect().toMap
    // reference composition: explode shingles, md5-prefix hash, K mins
    val h32 = conv(substring(md5($"s"), 1, 8), 16, 10).cast("long")
    val aggs = coefs.zipWithIndex.map { case ((a, b), k) =>
      min(pmod(lit(a) * $"hv" + lit(b), lit(p))).as(s"mh$k")
    }
    val viaCompose = docs
      .select($"doc_id",
        explode(GraftFunctions.charShingles($"text", 4)).as("s"))
      .select($"doc_id", h32.as("hv"))
      .groupBy($"doc_id").agg(aggs.head, aggs.tail: _*)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> Array(t._2, t._3, t._4, t._5)).toMap
    assert(viaExpr.keySet == Set(1L, 2L, 3L, 5L))
    assert(viaCompose.keySet == viaExpr.keySet)
    viaExpr.foreach { case (id, sig) =>
      assert(sig.sameElements(viaCompose(id)), s"doc $id signature mismatch")
    }
  }

  test("cosine_similarity survives CODEGEN_ONLY (doGenCode actually compiles)") {
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = Seq((Array(3.0, 4.0), Array(4.0, 3.0)))
        .toDF("a", "b")
        .select(GraftFunctions.cosineSimilarity($"a", $"b"))
        .as[Double].head()
      assert(math.abs(got - 24.0 / 25.0) < 1e-12)
    } finally {
      spark.conf.unset("spark.sql.codegen.factoryMode")
      spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("cosine_similarity works on float arrays and via SQL") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
                 (Array(1.0f, 1.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val got = spark.sql("SELECT cosine_similarity(a, b) FROM vecs")
      .as[Double].collect().sorted
    assert(math.abs(got(0) - 0.0) < 1e-12 && math.abs(got(1) - 1.0) < 1e-12)
  }

  test("dotProduct / l2Norm compositions agree with cosine expression") {
    val rnd = new Random(3)
    val rows = Seq.fill(20) {
      (Array.fill(12)(rnd.nextDouble()), Array.fill(12)(rnd.nextDouble()))
    }
    val got = rows.toDF("a", "b").select(
      (GraftFunctions.dotProduct($"a", $"b") /
        (GraftFunctions.l2Norm($"a") * GraftFunctions.l2Norm($"b"))).as("c1"),
      GraftFunctions.cosineSimilarity($"a", $"b").as("c2"))
      .as[(Double, Double)].collect()
    got.foreach { case (c1, c2) => assert(math.abs(c1 - c2) < 1e-12) }
  }

  test("multiHot encodes fixed vocab (ref streaming_rec.py:130-134)") {
    val vocab = Seq("Action", "Comedy", "Drama", "Horror")
    val got = Seq("Comedy|Horror", "Drama", "", "Sci-Fi")
      .toDF("genres")
      .select(GraftFunctions.multiHot($"genres", vocab).as("v"))
      .as[Seq[Int]].collect()
    assert(got(0) == Seq(0, 1, 0, 1))
    assert(got(1) == Seq(0, 0, 1, 0))
    assert(got(2) == Seq(0, 0, 0, 0))
    assert(got(3) == Seq(0, 0, 0, 0))
    assert(got.forall(v => v.length == vocab.length && v.forall(x => x == 0 || x == 1)))
  }

  test("charShingles emits every overlapping k-gram in one pass") {
    GraftFunctions.register(spark)
    val got = Seq("abcdef", "abc", "ab", "")
      .toDF("t")
      .select(GraftFunctions.charShingles($"t", 4).as("sh"))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("abcd", "bcde", "cdef"))
    assert(got(1) == Seq.empty) // len < k
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq.empty)
    // code-point iteration: supplementary chars must not surrogate-split
    val emoji = "a😀bc" // a😀bc = 4 code points
    val gotEmoji = Seq(emoji).toDF("t")
      .select(GraftFunctions.charShingles($"t", 2).as("sh"))
      .as[Seq[String]].head()
    assert(gotEmoji == Seq("a😀", "😀b", "bc"))
    // parity with the substring composition it replaces
    val text = "the quick brown fox jumps"
    val viaExpr = Seq(text).toDF("t")
      .select(explode(GraftFunctions.charShingles($"t", 4)).as("s"))
      .as[String].collect().toSeq
    val expected = (0 to text.length - 4).map(i => text.substring(i, i + 4))
    assert(viaExpr == expected)
  }

  test("RmseAggregator matches closed form and the SQL one-liner") {
    val rnd = new Random(11)
    val rows = Seq.fill(500)((rnd.nextDouble() * 5, rnd.nextDouble() * 5))
    val expected = math.sqrt(
      rows.map { case (p, l) => (p - l) * (p - l) }.sum / rows.size)
    val df = rows.toDF("pred", "label")
    df.createOrReplaceTempView("preds")
    val viaAgg = spark.sql("SELECT rmse_agg(pred, label) FROM preds")
      .as[Double].head()
    val viaSql = df.select(sqrt(avg(pow($"pred" - $"label", 2)))).as[Double].head()
    assert(math.abs(viaAgg - expected) < 1e-9)
    assert(math.abs(viaSql - expected) < 1e-9)
  }

  test("blendInterest follows U := (1-λr)U + λrT (ref streaming_rec.py:83-99)") {
    val u = Array(1.0, 0.0, 0.5); val t = Array(0.0, 1.0, 1.0); val r = 4.0
    val lambda = 0.05
    val expected = u.zip(t).map { case (uv, tv) =>
      uv * (1 - lambda * r) + tv * (lambda * r) }
    val got = Seq((u, t, r)).toDF("u", "t", "r")
      .select(GraftFunctions.blendInterest($"u", $"t", $"r", lambda))
      .as[Seq[Double]].head()
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }
}
