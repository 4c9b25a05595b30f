package graft.rec

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Result of one [[IndexMaintenance.compactCells]] pass, for operator
  * telemetry: how many cell partitions were rewritten and the data-file
  * count across them before/after. */
case class CompactStats(cells_compacted: Int, files_before: Int,
    files_after: Int)

/** Small-file compaction for the cid-partitioned index tables
  * ([[IvfIndex]] `cells`, [[IvfPqIndex]] `codes`).
  *
  * WHY: `append` deliberately promises that nothing already on disk is
  * read or rewritten — the right cost model for a daily increment, but
  * append-only maintenance accumulates one-or-more files per cell per
  * increment. At the daily regime the index docstrings target, a year
  * is ~365+ files per cell, and probe latency degrades from "read
  * nprobe/K of the BYTES" to "open nprobe/K of 365·K FILES" — file-open
  * overhead, not data, becomes the bound. That is the point where the
  * append contract stops being acceptable and a compaction pass pays
  * one bounded rewrite to restore it.
  *
  * WHAT: only cell partitions whose data-file count exceeds
  * `maxFilesPerCell` are rewritten — one partition-pruned scan of
  * exactly those cells (static `cid IN (...)` pruning, the same layout
  * property probes use), repartitioned by cid so each rewritten cell
  * lands as ONE file, written to a dot-prefixed staging dir inside the
  * table (invisible to partition discovery), then swapped in with
  * per-cell directory renames. Under-threshold cells are untouched —
  * not read, not rewritten — and the quantizers are never consulted:
  * compaction moves bytes between files inside each cell, so
  * probe-after-compact is byte-for-byte the same row set as before
  * (the spec asserts probe equality and the file-count drop).
  *
  * Concurrency: a maintenance op, not a serving op — each swapped cell
  * is briefly absent between its delete and rename, so run it from the
  * writer that owns the index (the same ownership `append` already
  * assumes), not concurrently with probes of the same directory.
  */
object IndexMaintenance {

  def compactCells(spark: SparkSession, tableDir: String,
                   maxFilesPerCell: Int): CompactStats = {
    require(maxFilesPerCell >= 1,
      s"maxFilesPerCell must be >= 1, got $maxFilesPerCell")
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(p: Path): Seq[String] =
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
          !s.getPath.getName.startsWith("."))
        .map(_.getPath.getName)
    val over = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("cid="))
      .map(d => d.getPath -> dataFiles(d.getPath).size)
      .filter(_._2 > maxFilesPerCell)
    if (over.isEmpty) return CompactStats(0, 0, 0)
    val cids = over.map(_._1.getName.stripPrefix("cid=").toInt)
    val staging = new Path(root, ".compacting")
    fs.delete(staging, true)
    spark.read.parquet(tableDir)
      .where(col("cid").isin(cids: _*)) // static pruning: only over cells
      .repartition(cids.length, col("cid")) // 1 task → 1 file per cell
      .write.mode("overwrite").partitionBy("cid").parquet(staging.toString)
    over.foreach { case (cellPath, _) =>
      val rewritten = new Path(staging, cellPath.getName)
      fs.delete(cellPath, true)
      // a cell whose files held zero rows produces no staged dir — the
      // delete alone is its compaction (nothing to keep)
      if (fs.exists(rewritten)) fs.rename(rewritten, cellPath)
    }
    fs.delete(staging, true)
    val after = over.map { case (p, _) =>
      if (fs.exists(p)) dataFiles(p).size else 0
    }.sum
    CompactStats(over.size, over.map(_._2).sum, after)
  }
}
