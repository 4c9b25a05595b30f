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

  test("salting collapses the hot key's shuffle-partition share") {
    // The guarantee q104 exists for, measured rather than shape-asserted:
    // with ~95% of the big side on ONE key and the broadcast/AQE escape
    // hatches closed (forced shuffle join, no runtime skew-splitting —
    // at 100 TB the small side may not broadcast and a single key can
    // exceed what AQE can split), the unsalted join concentrates the
    // hot key's rows in one shuffle partition; salting spreads them
    // across saltFactor sub-keys. Partition sizes are deterministic
    // here (fixed hash, fixed partition count, seeded salt).
    val conf = spark.conf
    val oldBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    val oldParts = conf.get("spark.sql.shuffle.partitions")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "64")
      val n = 20000
      val big = (1 to n).map(i => (if (i % 20 == 0) i % 7 else 1, i))
        .toDF("k", "v")
      val small = (0 to 6).map(k => (k, s"dim$k")).toDF("k", "name")
      def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
        val sizes = df.rdd
          .mapPartitions(it => Iterator(it.size.toLong)).collect()
        sizes.max.toDouble / sizes.sum
      }
      val plain = maxShare(big.join(small, Seq("k")))
      val salted = maxShare(
        SkewJoin.saltedEquiJoin(big, small, "k", saltFactor = 16))
      info(f"max shuffle-partition share: plain $plain%.3f -> salted $salted%.3f")
      assert(plain > 0.9, f"fixture not skewed enough to prove anything: $plain%.3f")
      assert(salted < 0.3, f"salting left a hot partition: $salted%.3f")
      assert(salted < plain / 3, f"spread did not collapse: $salted%.3f vs $plain%.3f")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBroadcast)
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.shuffle.partitions", oldParts)
    }
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
