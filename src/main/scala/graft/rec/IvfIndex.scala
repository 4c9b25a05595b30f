package graft.rec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions

/** Persistent IVF index (Jégou et al. 2011's inverted file, expressed as
  * a Spark TABLE LAYOUT): the quantizer's cell assignment becomes a
  * cid-PARTITIONED parquet table, so "probe nprobe cells" becomes
  * dynamic partition pruning — the probe-side cid set broadcasts into
  * the scan's PartitionFilters and Spark reads ONLY the probed cells'
  * files. That is the on-disk twin of q57's in-memory cell join, and the
  * property that makes a 100 TB index affordable to probe: I/O scales
  * with nprobe/K of the collection, enforced by the layout rather than
  * by operator discipline. IvfIndexSpec asserts both halves: results
  * equal the in-memory path, and the cells scan carries a
  * dynamicpruning PartitionFilter.
  *
  * cid is stored as INT on both sides: parquet partition-column
  * inference reads directory values as int, and a type-promotion cast on
  * the partition column would defeat dynamic partition pruning.
  */
object IvfIndex {

  /** Build: fit the relational Lloyd's quantizer, assign every vector to
    * its cell, write cells partitioned by cid (+ centroids alongside).
    * At 100 TB the quantizer fits on a sample (Clustering.lloydKMeans
    * doc); the assignment pass is one broadcast-scored scan. */
  def build(vectors: DataFrame, dir: String, k: Int = 16,
            iters: Int = 3): Unit = {
    val cent = Clustering.lloydKMeans(vectors, k, iters)
    Clustering.assignCells(vectors, cent, nprobe = 1)
      .withColumn("cid", col("cid").cast("int"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/cells")
    cent.write.mode("overwrite").parquet(s"$dir/centroids")
  }

  /** Append NEW vectors to an existing index with the STORED quantizer
    * kept FROZEN — the production maintenance regime for a corpus that
    * grows daily: assignment is one broadcast-scored scan of the
    * increment, the write appends files inside each cell's partition
    * directory, and nothing already on disk is read or rewritten. The
    * quantizer is retrained (a fresh [[build]]) only on distribution
    * drift; until then every probe sees old and new vectors through the
    * same cell geometry, so probe-after-append equals probing one index
    * built from the union under that quantizer (IvfIndexSpec asserts
    * exactly this). */
  def append(spark: SparkSession, vectors: DataFrame, dir: String): Unit = {
    val cent = spark.read.parquet(s"$dir/centroids")
    Clustering.assignCells(vectors, cent, nprobe = 1)
      .withColumn("cid", col("cid").cast("int"))
      .write.mode("append").partitionBy("cid").parquet(s"$dir/cells")
  }

  /** Compact cell partitions that [[append]] increments have fragmented
    * past `maxFilesPerCell` data files — see [[IndexMaintenance]] for
    * the cost model (append promises no rewrite; ~365 daily increments
    * later, probe latency is file-open overhead) and the swap
    * mechanics. Only over-threshold cells are read or rewritten; the
    * stored quantizer is untouched, so probe results are identical
    * before and after (IvfIndexSpec asserts both). */
  def compact(spark: SparkSession, dir: String,
              maxFilesPerCell: Int = 8): CompactStats =
    IndexMaintenance.compactCells(spark, s"$dir/cells", maxFilesPerCell)

  /** Probe: assign each probe to its `nprobe` nearest cells, then join
    * the (broadcast) probe set against the partitioned cells table — the
    * partition-column equi-join is what triggers dynamic partition
    * pruning — and rank candidates by exact cosine. */
  def probe(spark: SparkSession, dir: String, probes: DataFrame,
            nprobe: Int = 2, topK: Int = 3): DataFrame = {
    GraftFunctions.register(spark)
    val cent = spark.read.parquet(s"$dir/centroids")
    val pc = Clustering.assignCells(probes, cent, nprobe)
      .select(col("vec_id").as("probe_id"), col("emb").as("pe"),
        col("cid").cast("int").as("cid"))
    val cells = spark.read.parquet(s"$dir/cells")
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("vec_id"))
    cells.join(broadcast(pc), Seq("cid"))
      .where(col("probe_id") =!= col("vec_id"))
      .withColumn("score", GraftFunctions.cosineSimilarity(col("pe"), col("emb")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("vec_id").as("neighbor_id"),
        col("rank"), round(col("score"), 6).as("score"))
      .orderBy(col("probe_id"), col("rank"))
  }
}
