package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.TextOps

/** One emitted near-duplicate candidate: `a_id < b_id`, `est_jaccard`
  * the K-entry MinHash agreement fraction rounded to 6dp — the exact
  * row shape of the batch q131 (`TextOps.minhashPairsBounded`). */
case class NearDupPair(a_id: Long, b_id: Long, est_jaccard: Double)

/** One banded doc row entering a bucket group. */
private[stream] case class BandedDoc(band: Int, bucket: String,
    doc_id: Long, sig: Seq[Long])

/** Per-(band, bucket) stream state: the signatures of the members seen
  * so far (≤ cap of them), or the saturated tombstone (empty members,
  * flag set) once the bucket has proven itself a boilerplate/template
  * signal. */
private[stream] case class BucketState(members: Seq[(Long, Seq[Long])],
    saturated: Boolean)

/** Streaming near-duplicate detection — the ONLINE face of the
  * oracle-gated batch q131 (bounded-bucket MinHash LSH,
  * `queries/TextOps.scala`): documents arriving on a stream are
  * signed with the SAME native one-pass MinHash expression, banded
  * with the SAME band/bucket derivation, and each new document emits
  * a candidate pair against every previously seen member of each of
  * its buckets — so a near-duplicate of a document ingested three
  * batches (or three days) ago is caught the moment it arrives,
  * without ever re-scanning the corpus. This is the crawl-ingest shape
  * of the dedup stage: the batch form re-reads everything to answer
  * "what duplicates exist", the stream form answers "is THIS new doc a
  * duplicate" at arrival, with state bounded by cap · |buckets|.
  *
  * Semantics vs the batch twin (spec-pinned in DedupStreamSpec):
  *
  *  - A bucket whose population stays ≤ cap contributes exactly the
  *    batch q131 pairs — same candidates, same est_jaccard.
  *  - A bucket SATURATES when its (cap+1)-th member arrives: it emits
  *    nothing from then on and its state collapses to a tombstone
  *    (members cleared — the cap·C(cap,2) work/output bound is the
  *    q131 linearity rule, held online). The pairs its first `cap`
  *    members already emitted STAND: an online operator cannot
  *    retract history when a bucket later proves over-cap, and those
  *    docs' true near-duplicates keep colliding in their other,
  *    discriminative bands (the same rationale q131 cites for dropping
  *    over-cap buckets entirely). This PREFIX-pair set is the one
  *    documented divergence from the batch form.
  *  - A pair colliding in SEVERAL bands is emitted by each colliding
  *    band, always in the SAME micro-batch (emission happens at the
  *    later doc's arrival batch in every band), so exactly-once output
  *    is one `dropDuplicates` inside the consumer's `foreachBatch` —
  *    never a cross-batch state question. flatMapGroupsWithState must
  *    be the last stateful operator in the plan, so the dedup belongs
  *    to the sink side by construction.
  *
  * Scale shape: the signature is a pure projection (no shuffle), the
  * band explode is 4 rows/doc, and the only exchange is the groupBy on
  * (band, bucket) — the same shuffle key as the batch pair join. State
  * is O(buckets · cap) signatures and saturated buckets hold only a
  * tombstone, so corpus skew (the template bucket that breaks
  * all-pairs LSH) BOUNDS state instead of exploding it.
  */
object DedupStream {

  /** Wire the banding over a streaming (doc_id, text) frame and run
    * per-bucket incremental pair emission. Returns the APPEND-mode
    * candidate stream; dedupe per micro-batch at the sink (see class
    * doc). `cap` defaults to the batch q131 bucket cap. */
  def nearDupPairs(docs: DataFrame,
                   cap: Int = TextOps.lshBucketCapShared): Dataset[NearDupPair] = {
    val s = docs.sparkSession
    import s.implicits._
    require(cap > 0, s"bucket cap must be positive, got $cap")
    val sigLen = TextOps.lshSigLen
    val banded = TextOps.bandedKeepSig(
      docs.select(col("doc_id"),
          TextOps.sigColShared(s, col("text")).as("sig"))
        .where(col("sig").isNotNull))
      .as[BandedDoc]
    banded
      .groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: (Int, String), rows: Iterator[BandedDoc],
         state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(BucketState(Nil, saturated = false))
          if (st.saturated) {
            rows.foreach(_ => ()) // drain; tombstoned buckets emit nothing
            Iterator.empty
          } else {
            // batch-internal order is not guaranteed by the engine;
            // sort by doc_id (and collapse any replayed duplicate doc)
            // so the prefix semantics are deterministic under replay
            val arriving = rows.toArray.groupBy(_.doc_id).values
              .map(_.head).toArray.sortBy(_.doc_id)
              .filterNot(d => st.members.exists(_._1 == d.doc_id))
            var members = st.members.toVector
            var saturated = false
            val out = Vector.newBuilder[NearDupPair]
            for (d <- arriving if !saturated) {
              if (members.size + 1 > cap) saturated = true
              else {
                for ((mid, msig) <- members) {
                  var eq = 0
                  var k = 0
                  while (k < sigLen) {
                    if (msig(k) == d.sig(k)) eq += 1
                    k += 1
                  }
                  val est = math.rint(eq.toDouble / sigLen * 1e6) / 1e6
                  out += (if (mid < d.doc_id) NearDupPair(mid, d.doc_id, est)
                          else NearDupPair(d.doc_id, mid, est))
                }
                members = members :+ ((d.doc_id, d.sig))
              }
            }
            state.update(
              if (saturated) BucketState(Nil, saturated = true)
              else BucketState(members, saturated = false))
            out.result().iterator
          }
      }
  }
}
