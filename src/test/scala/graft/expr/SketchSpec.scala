package graft.expr

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two round-8 mergeable synopses: Count-Min never undercounts and
  * its cells equal a brute-force relational rebuild under any
  * partitioning (mergeability); Bloom bits admit every inserted element
  * (no false negatives) and the false-positive rate on disjoint probes
  * stays near theory. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 64

  private def cells(t: org.apache.spark.sql.Column) =
    transform(sequence(lit(0), lit(D - 1)), i =>
      i.cast("long") * W +
        pmod(conv(substring(md5(concat(lit("cm"), i.cast("string"),
          lit("_"), t)), 1, 8), 16, 10).cast("long"), lit(W.toLong)))

  test("CMS cells == brute-force rebuild, independent of partitioning") {
    val toks = (1 to 5000).map(i => s"tok${i % 97}")
    val expected = {
      val arr = new Array[Long](D * W)
      toks.foreach { t =>
        (0 until D).foreach { i =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s"cm${i}_$t".getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString
          arr(i * W + (java.lang.Long.parseLong(hex, 16) % W).toInt) += 1L
        }
      }
      arr.toSeq
    }
    Seq(1, 7).foreach { parts =>
      val got = toks.toDF("t").repartition(parts)
        .agg(CountMinSketch.agg(D, W)(cells(col("t"))).as("c"))
        .as[Seq[Long]].head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("CMS point estimate never undercounts") {
    val toks = (1 to 5000).map(i => s"tok${i % 97}")
    val df = toks.toDF("t")
    val sk = df.agg(CountMinSketch.agg(D, W)(cells(col("t"))).as("c"))
    val est = df.groupBy($"t").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(sk))
      .select($"n", array_min(transform(cells($"t"), p =>
        element_at($"c", (p + 1).cast("int")))).as("est"))
      .as[(Long, Long)].collect()
    assert(est.nonEmpty && est.forall { case (n, e) => e >= n })
  }

  private val M = 1024
  private val K = 3

  private def pos(c: org.apache.spark.sql.Column) =
    transform(sequence(lit(0), lit(K - 1)), j =>
      pmod(conv(substring(md5(concat(lit("bf"), j.cast("string"),
        lit("_"), c)), 1, 8), 16, 10).cast("long"), lit(M.toLong)))

  test("Bloom: no false negatives; disjoint-probe FP rate near theory") {
    val inserted = (1 to 100).map(i => s"in$i").toDF("s")
    val bloom = inserted.agg(BloomBits.agg(M)(pos(col("s"))).as("bits"))
    def isSet(p: org.apache.spark.sql.Column) =
      (call_function("shiftright",
        element_at(col("bits"), (((p - pmod(p, lit(32L))) / 32) + 1).cast("int")),
        pmod(p, lit(32L)).cast("int")) % 2) === 1
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.crossJoin(broadcast(bloom))
        .where(forall(pos(col("s")), isSet)).count()
    assert(hits(inserted) == 100, "every inserted element must test positive")
    val fp = hits((1 to 2000).map(i => s"out$i").toDF("s"))
    // theory: (1 - e^(-kn/m))^k ≈ 0.016 at k=3, n=100·3 hashes, m=1024;
    // deterministic given the fixed hash family — just bound it loosely
    assert(fp < 2000 * 0.05, s"false-positive count $fp out of theory's range")
  }

  test("Bloom merge is filter union (partitioning-independent)") {
    val df = (1 to 500).map(i => s"el$i").toDF("s")
    val one = df.coalesce(1).agg(BloomBits.agg(M)(pos(col("s"))).as("b"))
      .as[Seq[Long]].head()
    val many = df.repartition(11).agg(BloomBits.agg(M)(pos(col("s"))).as("b"))
      .as[Seq[Long]].head()
    assert(one == many)
  }
}
