package graft

import org.apache.spark.sql.functions._

/** q77's KMV estimator: the oracle check proves cross-engine parity;
  * this spec proves the SEMANTICS — the estimate actually lands near the
  * true distinct count at a cardinality far above k (the fixture only
  * exercises n ≈ 2.3k). Deterministic: fixed ids, fixed hash. */
class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("KMV estimate lands within theoretical error of the true count") {
    val k = 64
    val n = 20000
    val ids = (1 to n).map(i => s"user_$i").toDF("id")
    val h = conv(substring(md5($"id"), 1, 8), 16, 10).cast("long")
    val kth = ids.select(h.as("h")).distinct()
      .orderBy($"h").limit(k).agg(max($"h")).as[Long].head()
    val est = (k - 1).toDouble * 4294967296.0 / kth
    // KMV relative standard error ≈ 1/√(k−2) ≈ 12.7% at k=64; assert 3σ
    assert(math.abs(est - n) / n < 0.38, s"est=$est vs n=$n")
  }

  test("KMinDistinct aggregator == brute-force k smallest distinct, any partitioning") {
    val k = 32
    // deterministic LCG stream with heavy duplication (mod 997)
    val vals = (1 to 10000).map(i => (i * 1103515245L + 12345) % 997)
    val want = vals.distinct.sorted.take(k)
    val kmin = graft.expr.KMinDistinct.agg(k)
    // 13 partitions forces partial buffers + merges; dedup must survive both
    val got = vals.toDF("v").repartition(13)
      .agg(kmin($"v")).head().getSeq[Long](0)
    assert(got == want, s"got=$got want=$want")
  }

  test("KMinDistinct small-set branch returns all distinct values when n < k") {
    val kmin = graft.expr.KMinDistinct.agg(64)
    val got = Seq(5L, 3L, 5L, 9L, 3L, 1L).toDF("v").repartition(3)
      .agg(kmin($"v")).head().getSeq[Long](0)
    assert(got == Seq(1L, 3L, 5L, 9L))
  }
}
