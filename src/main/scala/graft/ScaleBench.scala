package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tiled scale-stress bench (VERDICT r13 item 1): the catalog's 100-TB
  * adjudications are DESIGN audits at sf0.1 — this main measures them.
  * It tiles the sf0.1 fixtures N× (default 10×) by unioning id-offset
  * copies, runs the 12-query scale set ([[ScaleSet]]: the 10 most
  * expensive catalog queries by r13 cpu_sec, plus the two dedup-family
  * representatives) and one build+probe per persistent ANN index at
  * BOTH scales, and
  * reports per-query cpu_sec scaling. A query whose cpu grows ~N× scales
  * linearly; one that grows faster than `N × 1.5` (the same-code spread
  * band SURVEY §8.7 measured, applied to the ratio) is flagged
  * super-linear — exactly the class of bug (driver-side state, quadratic
  * blocking, planning blowup) that a single-scale run cannot catch.
  *
  * Tiling model — "10× the users, same item catalog", the realistic
  * growth axis for the reference's domain (MovieLens user counts grow
  * ~100× across its published sizes; the movie catalog ~4×):
  *  - orders/lineitem: copy i offsets o_orderkey/l_orderkey by
  *    i×(max+1) and o_custkey by i×(max+1); l_partkey is UNCHANGED.
  *    The ratings fact (user=o_custkey, item=l_partkey) then has N×
  *    rows and N× users over the same items — per-user degree (the
  *    q32 skew bound) is preserved, per-item degree grows N× (the axis
  *    the item-keyed aggregations must absorb).
  *  - documents: doc_id offset by i×(max+1), and copy i's text is
  *    alphabet-ROTATED by i (a-z and A-Z each rotated i places;
  *    digits/punct/CJK untouched). Identical copies would make every
  *    doc a 10-clone near-dup cluster — the MinHash edge count (q72)
  *    would then grow ~N²/2 per doc by CONSTRUCTION of the tiling and
  *    false-flag the operator; rotation keeps each copy's
  *    within-corpus similarity structure identical to the source
  *    (shingle sets are rotated pointwise) while cross-copy shingle
  *    collisions become accidental, so the N× corpus behaves like N
  *    independent sf-corpora — the "bigger crawl" model. Copy 0 is the
  *    identity, so the 1× dir IS the source corpus.
  *  - embeddings: vec_id offset by i×(max+1) — each ANN cell gets N×
  *    the candidates under the same geometry.
  * Both scales are WRITTEN through the same tiler (scale 1 = one copy)
  * so parquet layout/codec/file-count-per-row are comparable; the
  * writer repartitions to `scale × source-partitions` so the N× dir has
  * N× the files a real N× dataset would.
  *
  * Methodology is Bench.scala's: per-scale, the query set runs as two
  * full interleaved passes (cache cleared per pass) and each query
  * reports the per-metric min; cpu_sec (executor task CPU via a
  * drained-bus listener delta) is the load-insensitive instrument on
  * this shared host. Index probes report a median of `reps` timed
  * executions after an untimed warmup (IndexBench's convention).
  * Driver-heap context: used heap after clearCache()+GC is reported
  * per scale — in local mode the block manager shares the heap, so this
  * is a bounded-growth sanity signal, not a hard gate.
  *
  * Output: ONE JSON line (stdout + stderr, Bench's convention); the
  * committed `SCALEBENCH_r{N}.json` is this line.
  */
object ScaleBench {

  /** The 10 most expensive catalog queries by BENCH_DETAIL_r13_final
    * cpu_sec — together 87% of the catalog's cpu total — plus the two
    * dedup-family representatives whose scaling a single-scale run
    * cannot vouch for: q72 (MinHash-edge connected components — the
    * ITERATIVE pointer-jumping operator, where driver-side state or a
    * per-round planning blowup would hide) and q29 (the banded
    * signature equi-join itself — whose r14 run FLAGGED super-linear,
    * leading to the bounded-bucket q131 that rides along to demonstrate
    * the fix scales where the exact form cannot). */
  private val ScaleSet = Seq(
    "q88_lightgcn_training",
    "q107_lightgcn_holdout",
    "q32_item_cf",
    "q65_graph_prop_k2",
    "q106_bpr_topn_metric",
    "q86_mf_gd_training",
    "q37_als_recs",
    "q27_ngram_jaccard",
    "q87_bpr_gd_training",
    "q36_graph_propagation",
    "q72_dedup_components",
    "q28_minhash_sig",
    "q29_minhash_pairs",
    "q131_minhash_pairs_bounded")

  /** The dedup queries share one cached sub-plan (the MinHash signature
    * table), and Bench's first-consumer-pays attribution broke for them
    * at 10×: by the time the dedup group runs, the pass's accumulated
    * caches (capped ratings, trainer intermediates) push unified-memory
    * STORAGE past the eviction floor, so any execution borrowing evicts
    * the signature blocks between — and even mid-way through — these
    * sub-second queries, which then re-derive signatures inside their
    * own timing (r14 diagnosis: q131's cpu_ratio read 24–32 in-bench
    * while its output and its clean-session warm-cache cpu both grew
    * ~11×). ScaleBench therefore runs each dedup-stage query under a
    * CONTROLLED cache state: clearCache() (storage now holds nothing to
    * fight over), then — for the signature CONSUMERS — one untimed run
    * of the signature query to materialize the shared table hot. q28
    * itself gets only the clear, so its timed number IS the signature
    * build. Residual in-bench inflation remains on these sub-second
    * queries even with the hot shared table (late-pass JVM/session
    * state: q72's pinned checkpoint blocks, code-cache pressure —
    * clean-session measurements run 2-4× cheaper), which is why each
    * query also reports rows_1x/rows_Nx: OUTPUT growth is noise-free
    * and adjudicates any cpu flag (see the JSON assembly note). */
  private val DedupStage = Set(
    "q72_dedup_components", "q28_minhash_sig",
    "q29_minhash_pairs", "q131_minhash_pairs_bounded")

  private val Passes = 2

  private final class TaskTimeListener extends SparkListener {
    val cpuNs = new AtomicLong
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) cpuNs.addAndGet(m.executorCpuTime)
    }
  }

  /** Union of `scale` id-offset copies, written as `dst/<name>.parquet`.
    * `keyMax` maps each column to offset to (max value + 1) from the
    * SOURCE table, so copy i's ids live in [i*(max+1), (i+1)*(max+1))
    * and cross-copy joins on offset keys match only within a copy.
    * Offsets are applied via a broadcast cross join against a
    * `scale`-row tile table (no driver-side loop over copies), and each
    * offset column is cast back to its source type (the fixture ids all
    * fit: the largest 10× key is ~6M, far under Int.MaxValue). */
  private[graft] def tile(spark: SparkSession, src: DataFrame, dst: String,
                          scale: Int, keys: Seq[String]): Unit = {
    val keyMax: Map[String, Long] = keys.map { k =>
      k -> (src.agg(max(col(k))).head().getAs[Number](0).longValue + 1L)
    }.toMap
    val tiles = spark.range(scale).select(col("id").as("__tile"))
    val tiled = src.crossJoin(broadcast(tiles))
    val withOffsets = keys.foldLeft(tiled) { (df, k) =>
      df.withColumn(k,
        (col(k) + col("__tile") * lit(keyMax(k))).cast(src.schema(k).dataType))
    }
    val srcParts = math.max(1, src.rdd.getNumPartitions)
    withOffsets.drop("__tile")
      .repartition(scale * srcParts)
      .write.mode("overwrite").parquet(dst)
  }

  /** Documents tile by per-copy UNION (not cross join) because copy i's
    * text must be alphabet-rotated by i — `translate` needs a literal
    * replacement alphabet per copy (see the object doc for why identical
    * text copies would corrupt the dedup queries' scaling signal). The
    * union is `scale` branches of one scan each — Catalyst plans it as a
    * single union of scans, no driver-side data movement. Rotation
    * aliases at i ≥ 26 (rot-26 = identity); the tile counts this bench
    * runs are far below that. */
  private[graft] def tileDocuments(spark: SparkSession, src: DataFrame,
                                   dst: String, scale: Int): Unit = {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val docMax =
      src.agg(max(col("doc_id"))).head().getAs[Number](0).longValue + 1L
    val idType = src.schema("doc_id").dataType
    val copies = (0 until scale).map { i =>
      val r = i % 26
      val rotL = lower.drop(r) + lower.take(r)
      val rotU = upper.drop(r) + upper.take(r)
      src.withColumn("doc_id",
          (col("doc_id") + lit(i.toLong * docMax)).cast(idType))
        .withColumn("text",
          translate(col("text"), lower + upper, rotL + rotU))
    }
    val srcParts = math.max(1, src.rdd.getNumPartitions)
    copies.reduce(_ unionAll _)
      .repartition(scale * srcParts)
      .write.mode("overwrite").parquet(dst)
  }

  private def buildTiledDir(spark: SparkSession, sfDir: String,
                            base: String, scale: Int): String = {
    val d = s"$base/x$scale"
    tile(spark, Tables.lineitem(spark, sfDir), s"$d/lineitem.parquet",
      scale, Seq("l_orderkey"))
    tile(spark, Tables.orders(spark, sfDir), s"$d/orders.parquet",
      scale, Seq("o_orderkey", "o_custkey"))
    tileDocuments(spark, Tables.documents(spark, sfDir),
      s"$d/documents.parquet", scale)
    tile(spark, Tables.embeddings(spark, sfDir), s"$d/embeddings.parquet",
      scale, Seq("vec_id"))
    d
  }

  private def usedHeapMb(): Long = {
    System.gc()
    Thread.sleep(200)
    val rt = Runtime.getRuntime
    (rt.totalMemory - rt.freeMemory) / 1048576
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE_TILES", "10").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_PROBE_REPS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = java.nio.file.Files.createTempDirectory("graft-scale").toString
    val scales = Seq(1, n)
    val dirs = scales.map(s => s -> buildTiledDir(spark, sfDir, base, s)).toMap

    val taskTimes = new TaskTimeListener
    spark.sparkContext.addSparkListener(taskTimes)
    def drainedCpuNs(): Long = {
      org.apache.spark.graft.ListenerDrain.waitUntilEmpty(spark.sparkContext)
      taskTimes.cpuNs.get()
    }

    val selected = ScaleSet.map(q => q -> SparkEntry.queries(q))

    // per scale: Passes full interleaved passes, per-metric min (Bench's
    // host-load discipline — samples a full pass apart decorrelate load
    // waves; pass 1 fully warms JIT so pass 2 is steady-state)
    def runScale(dir: String): (Map[String, (Double, Double, Long)], Long) = {
      val samples = (1 to Passes).flatMap { _ =>
        spark.catalog.clearCache()
        selected.map { case (name, fn) =>
          // time the propagation BUILD, not the memo lookup (Bench's rule)
          if (name == "q72_dedup_components")
            _root_.graft.queries.TextOps.clearLabelMemo()
          // controlled cache state for the dedup stages (see [[DedupStage]])
          if (DedupStage(name)) {
            spark.catalog.clearCache()
            if (name != "q28_minhash_sig")
              SparkEntry.queries("q28_minhash_sig")(spark, dir).count()
          }
          val cpu0 = drainedCpuNs()
          val t0 = System.nanoTime()
          val rows = try fn(spark, dir).count() catch {
            case e: Throwable =>
              System.err.println(s"[scalebench] $name FAILED: ${e.getMessage}")
              -1L
          }
          val wall = (System.nanoTime() - t0) / 1e9
          val cpu = (drainedCpuNs() - cpu0) / 1e9
          name -> ((wall, cpu, rows))
        }
      }
      val byQuery = selected.map { case (name, _) =>
        val s = samples.collect { case (`name`, t) => t }
        name -> ((s.map(_._1).min, s.map(_._2).min, s.map(_._3).max))
      }.toMap
      spark.catalog.clearCache()
      (byQuery, usedHeapMb())
    }

    // one build + median-of-reps probe per persistent index family, at
    // each scale; probes are the 10 lowest source ids (present at every
    // scale — copy 0 is the source id range)
    def runIndexes(dir: String): Map[String, (Double, Double)] = {
      val e = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
        .cache()
      e.count()
      val probes = e.where(col("vec_id") < 10)
      def medianMs(probe: () => DataFrame): Double = {
        def once(): Double = {
          val t0 = System.nanoTime()
          probe().collect()
          (System.nanoTime() - t0) / 1e6
        }
        once() // warmup: JIT + quantizer read
        val xs = Vector.fill(reps)(once()).sorted
        if (reps % 2 == 1) xs(reps / 2)
        else (xs(reps / 2 - 1) + xs(reps / 2)) / 2.0
      }
      def timedBuild(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      val out = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
      val ivfDir = java.nio.file.Files.createTempDirectory("graft-sc-ivf").toString
      val bIvf = timedBuild(graft.rec.IvfIndex.build(e, ivfDir))
      out += "ivf" -> ((bIvf, medianMs(() =>
        graft.rec.IvfIndex.probe(spark, ivfDir, probes))))
      val pqDir = java.nio.file.Files.createTempDirectory("graft-sc-pq").toString
      val bPq = timedBuild(graft.rec.PqIndex.build(e, pqDir))
      out += "pq" -> ((bPq, medianMs(() =>
        graft.rec.PqIndex.probe(spark, pqDir, probes, e))))
      val ipqDir = java.nio.file.Files.createTempDirectory("graft-sc-ivfpq").toString
      val bIpq = timedBuild(graft.rec.IvfPqIndex.build(e, ipqDir))
      out += "ivfpq" -> ((bIpq, medianMs(() =>
        graft.rec.IvfPqIndex.probe(spark, ipqDir, probes, e))))
      e.unpersist()
      out.toMap
    }

    val results = scales.map { s => s -> runScale(dirs(s)) }.toMap
    val idx = scales.map { s => s -> runIndexes(dirs(s)) }.toMap

    def r2(v: Double) = "%.2f".format(v)
    def r3(v: Double) = "%.3f".format(v)
    val (q1, heap1) = results(1)
    val (qn, heapN) = results(n)
    // the flag: every candidate ratio band is the measured same-code
    // spread (SURVEY §8.7 p90 1.82 ≈ 1.5 applied conservatively to a
    // min-of-2 cpu ratio) — linear is ratio ≈ n
    val flagged = ScaleSet.filter { q =>
      q1(q)._2 > 0.05 && qn(q)._2 / math.max(q1(q)._2, 1e-9) > n * 1.5
    }
    val qJson = ScaleSet.map { q =>
      val ratio = qn(q)._2 / math.max(q1(q)._2, 1e-9)
      // rows_ratio is the SEMANTICS-level scaling signal: output growth
      // is exactly reproducible (no timing noise), so it adjudicates
      // whether a cpu flag reflects the operator (output grew
      // super-linearly) or session-state measurement noise on a
      // sub-second query (output grew linearly while cpu jittered)
      val rowsRatio = qn(q)._3.toDouble / math.max(q1(q)._3.toDouble, 1.0)
      s""""$q":{"cpu_sec_1x":${r3(q1(q)._2)},"cpu_sec_${n}x":${r3(qn(q)._2)},""" +
        s""""cpu_ratio":${r2(ratio)},"rows_1x":${q1(q)._3},"rows_${n}x":${qn(q)._3},""" +
        s""""rows_ratio":${r2(rowsRatio)},""" +
        s""""wall_1x":${r3(q1(q)._1)},"wall_${n}x":${r3(qn(q)._1)}}"""
    }.mkString("{", ",", "}")
    val iJson = Seq("ivf", "pq", "ivfpq").map { k =>
      val (b1, p1) = idx(1)(k)
      val (bn, pn) = idx(n)(k)
      s""""$k":{"build_ms_1x":${math.round(b1)},"build_ms_${n}x":${math.round(bn)},""" +
        s""""probe_ms_1x":${math.round(p1)},"probe_ms_${n}x":${math.round(pn)},""" +
        s""""probe_ratio":${r2(pn / math.max(p1, 1e-9))}}"""
    }.mkString("{", ",", "}")
    val cpuTot1 = ScaleSet.map(q1(_)._2).sum
    val cpuTotN = ScaleSet.map(qn(_)._2).sum
    val line =
      s"""{"metric":"scale_bench","tiles":$n,"passes":$Passes,"cpus":$cpus,""" +
        s""""heap_max_mb":${Runtime.getRuntime.maxMemory / 1048576},""" +
        s""""cpu_sec_total_1x":${r3(cpuTot1)},"cpu_sec_total_${n}x":${r3(cpuTotN)},""" +
        s""""cpu_total_ratio":${r2(cpuTotN / math.max(cpuTot1, 1e-9))},""" +
        s""""superlinear_flagged":[${flagged.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""heap_after_gc_mb_1x":$heap1,"heap_after_gc_mb_${n}x":$heapN,""" +
        s""""queries":$qJson,"index_probes":$iJson,"sf":"$sfDir"}"""
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
