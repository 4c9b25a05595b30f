package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of the big side lands on one hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 else 1, i))
      .toDF("k", "v")
    val small = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select($"k", $"v", $"name")
    val salted = SkewJoin.saltedEquiJoin(big, small, "k", saltFactor = 8)
      .select($"k", $"v", $"name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("extensions-injected SQL functions resolve without register()") {
    // TestSpark sets spark.sql.extensions=graft.expr.GraftExtensions;
    // a fresh child session must resolve the functions purely via the
    // injected registry
    val fresh = spark.newSession()
    val cos = fresh.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D))")
      .collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val sh = fresh.sql("SELECT char_shingles('abcd', 3)")
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("abc", "bcd"))
  }
}
