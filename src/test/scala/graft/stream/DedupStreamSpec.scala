package graft.stream

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.TextOps

/** The streaming near-dup operator against its ORACLE-GATED batch twin
  * (q131): same signatures, same banding, same bucket cap — so the
  * equality contract below is transitively checked by the DuckDB gate
  * that certifies q131 itself.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Run the fixture corpus through the streaming operator in `splits`
    * micro-batches (docs fed in doc_id order), collecting each batch's
    * DISTINCT pairs (the documented sink-side dedup). */
  private def streamPairs(splits: Int, cap: Int = TextOps.lshBucketCapShared)
      : Seq[(Long, Seq[(Long, Long, Double)])] = {
    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)]
      .collect().sortBy(_._1)
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = mutable.ListBuffer.empty[(Long, Seq[(Long, Long, Double)])]
    val q = DedupStream.nearDupPairs(in.toDF().toDF("doc_id", "text"), cap)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[NearDupPair], id: Long) =>
        val rows = batch.dropDuplicates("a_id", "b_id")
          .collect().map(p => (p.a_id, p.b_id, p.est_jaccard)).toSeq
        out.synchronized { out += ((id, rows)) }; ()
      }
      .start()
    try {
      val per = math.max(1, math.ceil(docs.length.toDouble / splits).toInt)
      docs.grouped(per).foreach { b =>
        in.addData(b.toIndexedSeq); q.processAllAvailable()
      }
    } finally q.stop()
    out.toSeq
  }

  /** The fixture's banded rows (doc_id, sig, band, bucket) via the SAME
    * shared faces the operator uses. */
  private def bandedRows(): Array[(Long, Seq[Long], Int, String)] =
    TextOps.bandedKeepSig(
      graft.Tables.documents(spark, sfDir)
        .select($"doc_id", TextOps.sigColShared(spark, $"text").as("sig"))
        .where($"sig".isNotNull))
      .as[(Long, Seq[Long], Int, String)].collect()

  private def est(a: Seq[Long], b: Seq[Long]): Double =
    a.zip(b).count(p => p._1 == p._2).toDouble / TextOps.lshSigLen

  test("streaming pairs = batch q131 pairs + the saturated buckets' prefixes") {
    val cap = TextOps.lshBucketCapShared
    val streamed = streamPairs(splits = 3)
      .flatMap(_._2).toSet

    val batch = TextOps.minhashPairsBounded.run(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSet

    // expected extras: for each over-cap (band, bucket), all pairs among
    // its first `cap` members by doc_id (= arrival order here)
    val byBucket = bandedRows().groupBy(r => (r._3, r._4))
    val overCap = byBucket.filter(_._2.length > cap)
    assert(overCap.nonEmpty, // the contract's second leg must be exercised
      s"fixture has no over-cap bucket at cap=$cap — q132's profile changed?")
    val prefixPairs = overCap.values.flatMap { rows =>
      val first = rows.sortBy(_._1).take(cap)
      for {
        i <- first.indices; j <- (i + 1) until first.length
      } yield (first(i)._1, first(j)._1,
        math.rint(est(first(i)._2, first(j)._2) * 1e6) / 1e6)
    }.toSet

    assert(batch.subsetOf(streamed),
      s"missing batch pairs: ${(batch -- streamed).take(5)}")
    assert(streamed == batch ++ prefixPairs,
      s"unexpected: ${(streamed -- batch -- prefixPairs).take(5)} / " +
        s"missing: ${(batch ++ prefixPairs -- streamed).take(5)}")
  }

  test("incremental state = one-shot: any batch split yields the same set") {
    val one = streamPairs(splits = 1).flatMap(_._2).toSet
    val five = streamPairs(splits = 5).flatMap(_._2).toSet
    assert(one == five)
  }

  test("a pair spanning micro-batches is emitted at the later doc's arrival") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = mutable.ListBuffer.empty[(Long, Long, Long)] // batch, a, b
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val q = DedupStream.nearDupPairs(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupPair], id: Long) =>
        val rows = b.dropDuplicates("a_id", "b_id").collect()
        out.synchronized { rows.foreach(p => out += ((id, p.a_id, p.b_id))) }; ()
      }
      .start()
    try {
      in.addData((1L, text)); q.processAllAvailable()
      in.addData((7L, "unrelated filler words nothing shared here at all x y"))
      q.processAllAvailable()
      in.addData((9L, text)); q.processAllAvailable()
    } finally q.stop()
    // the (1, 9) duplicate pair surfaces exactly once, in doc 9's batch
    assert(out.toList == List((2L, 1L, 9L)))
  }

  test("cross-band duplicate emissions stay inside one micro-batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val raw = mutable.ListBuffer.empty[(Long, Int)] // batch -> emissions
    val text = "one two three four five six seven eight nine ten eleven"
    val q = DedupStream.nearDupPairs(in.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupPair], id: Long) =>
        val n = b.collect().length
        raw.synchronized { raw += ((id, n)) }; ()
      }
      .start()
    try {
      in.addData((1L, text)); q.processAllAvailable()
      in.addData((2L, text)); q.processAllAvailable()
    } finally q.stop()
    // identical docs collide in all 4 bands: 4 raw emissions, all in
    // batch 1 (the later doc's arrival), none later
    assert(raw.toList == List((0L, 0), (1L, 4)))
  }

  test("the (cap+1)-th member tombstones its bucket and emits nothing") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = mutable.ListBuffer.empty[(Long, Long, Double)]
    val text = "same words every time for the saturation test of buckets"
    val q = DedupStream.nearDupPairs(in.toDF().toDF("doc_id", "text"), cap = 3)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[NearDupPair], _: Long) =>
        val rows = b.dropDuplicates("a_id", "b_id")
          .collect().map(p => (p.a_id, p.b_id, p.est_jaccard))
        out.synchronized { out ++= rows }; ()
      }
      .start()
    try {
      in.addData((1L, text), (2L, text), (3L, text)); q.processAllAvailable()
      in.addData((4L, text)); q.processAllAvailable() // saturates: silence
      in.addData((5L, text)); q.processAllAvailable() // tombstoned: silence
    } finally q.stop()
    assert(out.toSet ==
      Set((1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))) // C(3,2), est 1.0
  }
}
