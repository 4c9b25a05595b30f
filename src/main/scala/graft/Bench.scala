package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every catalog query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass touches
  * each fixture table first so per-query numbers measure the query, not
  * session/scan/codegen bring-up; the catalog then runs TWICE end to end
  * — pass 1 in full, then pass 2 in full — and each query reports the
  * min of its two samples. The passes are INTERLEAVED at catalog level
  * (not back-to-back per query) deliberately: the r8 bench showed 2-5×
  * swings on two CONTIGUOUS bands of untouched queries (q29-q31,
  * q80-q82) that vanished on re-measurement with identical code and
  * data (q31 6.4 s → 1.3 s, q82 3.7 s → 1.3 s). Root cause is HOST
  * load: this container shares its machine, and `load average: 9.4`
  * shows up with zero runnable processes in the container's own pid
  * namespace — an external load wave spanning a few seconds covers
  * both of a query's back-to-back passes, so per-query min-of-2 can't
  * filter it, while samples a full catalog (~60 s) apart decorrelate
  * it. Pass 1 also fully warms JIT/codegen, so every pass-2 sample is
  * steady-state regardless of sort position (isolated 7-query runs
  * measured the same small queries 3-7× slower than in-catalog runs
  * for JIT reasons alone — isolation is the wrong way to re-check a
  * single query's number; compare full-catalog runs instead). Timings
  * are rounded to ms so the whole line stays compact enough for log
  * tails.
  */
object Bench {
  private val Passes = 2

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: one scan per fixture table + one tiny aggregate
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).count())
    Tables.events(spark, sfDir).count()
    // dev loop: SPARK_GRAFT_BENCH_ONLY=q86,q88 times just those queries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        only.forall(o => o.contains(name) || o.contains(name.split("_").head)) }
    val samples = (1 to Passes).flatMap { _ =>
      // Each pass starts with an empty SQL cache. Queries share cached
      // sub-plans (q27's shingles, q29's signatures, q57's centroids —
      // the CacheManager dedupes by logical plan), so without the clear
      // a pass-2 sample measures pass-1's cache hit, not the query
      // (q28 read 0.15 s warm vs 0.86 s real). Clearing per PASS, not
      // per query, keeps within-pass sharing — the pipeline cost model
      // (a quantizer is built once, not once per consumer; per-query
      // clearing re-built it for q36/q57/q65/q101 separately and
      // inflated the total ~30 s with no attribution gained) and the
      // same semantics every prior round measured. Also bounds cache
      // accumulation across the 100+-query catalog on the 8 g heap.
      spark.catalog.clearCache()
      selected.map { case (name, fn) =>
        // q72 memoizes its converged labels per (session, dataset) — the
        // right artifact semantics for a dedup pipeline, but a bench pass
        // must time the propagation BUILD, not the memo lookup, or a
        // regression in the build becomes invisible. (q78, which composes
        // q72's labels, still measures the memoized composition — its
        // number stays attributable to the composition itself.)
        if (name == "q72_dedup_components")
          _root_.graft.queries.TextOps.clearLabelMemo()
        val t0 = System.nanoTime()
        try fn(spark, sfDir).count() catch {
          case e: Throwable =>
            // surface failures — a fast-failing query must not read as a speedup
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    val results = selected.map { case (name, _) =>
      name -> samples.collect { case (`name`, t) => t }.min
    }
    def r3(v: Double): String = "%.3f".format(v)
    // keys are the unique qNN prefix: the driver keeps only a 2000-byte
    // stdout TAIL, and 76 full query names put the line's head outside
    // the window (r5's "parsed": null). qNN keeps the whole line
    // ~1.44 KB at 111 queries — ~35 more queries of headroom before the
    // window clips the head again; re-measure `wc -c` when the catalog
    // approaches 145.
    val qs = results.map { case (k, v) => "\"" + k.split("_").head + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Both streams: sbt's log decoration ("[info] " prefix, "[success]"
    // trailer) rides stdout and broke the driver's tail parse
    // (BENCH_r06 "parsed": null) — stderr carries the line bare.
    println(line)
    System.err.println(line)
    spark.stop()
  }
}
