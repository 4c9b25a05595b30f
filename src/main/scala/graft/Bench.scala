package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every catalog query at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. A warmup pass touches
  * each fixture table first so per-query numbers measure the query, not
  * session/scan/codegen bring-up; each query then runs TWICE and the min
  * is reported, so a GC pause / machine-load blip on one pass cannot
  * masquerade as a plan regression (the r5 bench showed a contiguous
  * 2-5× swing on untouched queries for exactly that reason). Timings are
  * rounded to ms so the whole line stays compact enough for log tails.
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
    val results = selected.map { case (name, fn) =>
      val times = (1 to Passes).map { _ =>
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
        (System.nanoTime() - t0) / 1e9
      }
      name -> times.min
    }
    def r3(v: Double): String = "%.3f".format(v)
    // keys are the unique qNN prefix: the driver keeps only a 2000-byte
    // stdout TAIL, and 76 full query names put the line's head outside
    // the window (r5's "parsed": null). qNN keeps the whole line ~1.1 KB.
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
