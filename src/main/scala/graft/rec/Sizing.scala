package graft.rec

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Scale-derived sizing/degradation decisions shared by the trainer and
  * propagation pipelines (VERDICT r21 "What's wrong" items 1–2).
  *
  * Both helpers exist because the broadcast-join epoch pipelines have NO
  * exchange inside an epoch: AQE never gets a chance to size their
  * relations, so the two decisions AQE would normally make at runtime —
  * how many partitions, and which join side is small enough to broadcast
  * — have to be made here, from first principles, in a way that stays
  * correct at 100 TB and not just on the local fixtures.
  */
object Sizing {

  /** Session conf gating the id-dimension `broadcast()` hints (`on` by
    * default; set `off` to degrade every hinted join to the planner's
    * default strategy — sort-merge over the id key — without a code
    * edit). */
  val DimBroadcastConf = "spark.graft.dimBroadcast"

  /** `broadcast(df)` for an ID-DIMENSION relation (factor/gradient/degree
    * tables: one row — or `dim` rows when exploded — per distinct
    * user/item), gated on [[DimBroadcastConf]].
    *
    * The 100 TB arithmetic the hint assumes: a broadcast relation is
    * capped at 8 GB / 512 M rows (guide §3.1), and each factor row is
    * ~(rank+1)·8 B plus ~2× framing — so at rank 64 the hint is safe to
    * ~10⁷–10⁸ distinct ids and NOT beyond. |items| stays in catalog range
    * (10⁶–10⁷) at any data scale, but |users| grows with the deployment;
    * a deployment whose user dimension outgrows the cap sets
    * `spark.graft.dimBroadcast=off` and every gated join degrades to the
    * exact pre-r21 sort-merge plan (SizingSpec pins the fallback). The
    * FACT side (ratings/edges/triples — the side that scales with data,
    * not with the id space) is never hinted anywhere. */
  def dim(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.get(DimBroadcastConf, "on")
          .equalsIgnoreCase("off")) df
    else broadcast(df)

  /** Byte-aware partition count for coalescing fact-derived relations
    * consumed by the exchange-free epoch pipelines:
    * `max(defaultParallelism/4, estimatedLeafBytes/advisoryPartitionSize)`.
    *
    * The r21 sizing was `defaultParallelism/4` alone — right locally
    * (few fat partitions stop every downstream aggregation from building
    * one near-useless partial-agg hash map per partition), but derived
    * from CORE COUNT where the guide's §2.2 rule is 100 MB–1 GB
    * partitions BY BYTES: at 100 TB with 1,000 cores, cores/4 = 250
    * partitions would mean hundreds of GB per partition — guaranteed
    * spill/OOM in the cache and every task reading it. The byte clamp
    * keeps the local behavior (fixture facts are ≪ one advisory
    * partition, so the cores term binds) while bounding partition SIZE at
    * scale: 100 TB / 64 MB advisory ⇒ ~1.6 M partitions, far above any
    * cores/4, so the coalesce becomes a no-op and the fact keeps its
    * natural scan/AQE partitioning.
    *
    * Bytes come from the plan's LEAF statistics (parquet scans report
    * real file bytes; materialized caches report real cached bytes).
    * Leaves whose stats are the `spark.sql.defaultSizeInBytes` sentinel
    * (fresh checkpoint re-roots) are unknown, not huge — they contribute
    * 0. An un-materialized cached join can over-estimate (size-only join
    * stats multiply) — the failure direction is a no-op coalesce, i.e.
    * natural partitioning, which is the safe side. */
  def factParts(df: DataFrame): Int = {
    val ss = df.sparkSession
    val advisory = math.max(1L, JavaUtils.byteStringAsBytes(
      ss.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")))
    val statless = BigInt(ss.conf.get("spark.sql.defaultSizeInBytes",
      Long.MaxValue.toString).toLong)
    val leafBytes = df.queryExecution.optimizedPlan.collectLeaves()
      .map(_.stats.sizeInBytes)
      .filter(s => s > 0 && s < statless)
      .sum
    val byCores = math.max(2, ss.sparkContext.defaultParallelism / 4)
    val byBytes = (leafBytes / advisory).min(BigInt(Int.MaxValue)).toInt
    math.max(byCores, byBytes)
  }
}
