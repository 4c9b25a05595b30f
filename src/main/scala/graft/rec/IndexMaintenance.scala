package graft.rec

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * is briefly absent between its aside-rename and staged-rename, so run
  * it from the writer that owns the index (the same ownership `append`
  * already assumes), not concurrently with probes of the same directory.
  *
  * Crash durability: the swap never deletes the only copy of a cell.
  * Each cell is renamed ASIDE (`cid=N` → `.old.cid=N`), the staged
  * rewrite renamed in, and the aside copy deleted LAST — so at every
  * instant the cell's rows live in at least one of {live, aside}. A
  * crashed run leaves dot-prefixed dirs (invisible to partition
  * discovery); the next run's recovery pass restores any cell whose
  * live dir is missing from its aside copy, deletes completed-swap
  * asides, and only then clears staging.
  */
object IndexMaintenance {

  private val StagingName = ".compacting"
  private val AsidePrefix = ".old."

  /** Resolve anything a crashed prior [[compactCells]] run left behind,
    * BEFORE touching the table again. An aside dir `.old.cid=N` with no
    * live `cid=N` means the crash hit between the aside-rename and the
    * staged-rename — the aside IS the cell's data, so rename it back. An
    * aside alongside a live `cid=N` means the swap completed and only
    * the final aside-delete was lost — drop the aside. Only once every
    * aside is resolved is the staging dir safe to clear: under the
    * aside-first ordering the staged rewrite is never the sole copy of
    * any row, so deleting it here can at worst waste a rewrite, never
    * lose data (the old delete-then-rename ordering could). */
  private[rec] def recoverCrashedSwap(fs: FileSystem, root: Path): Unit = {
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(AsidePrefix + "cid="))
      .foreach { s =>
        val live = new Path(root,
          s.getPath.getName.stripPrefix(AsidePrefix))
        if (!fs.exists(live)) fs.rename(s.getPath, live)
        else fs.delete(s.getPath, true)
      }
    fs.delete(new Path(root, StagingName), true)
  }

  def compactCells(spark: SparkSession, tableDir: String,
                   maxFilesPerCell: Int): CompactStats = {
    require(maxFilesPerCell >= 1,
      s"maxFilesPerCell must be >= 1, got $maxFilesPerCell")
    val root = new Path(tableDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    recoverCrashedSwap(fs, root)
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
    val staging = new Path(root, StagingName)
    spark.read.parquet(tableDir)
      .where(col("cid").isin(cids: _*)) // static pruning: only over cells
      .repartition(cids.length, col("cid")) // 1 task → 1 file per cell
      .write.mode("overwrite").partitionBy("cid").parquet(staging.toString)
    over.foreach { case (cellPath, _) =>
      val rewritten = new Path(staging, cellPath.getName)
      val aside = new Path(root, AsidePrefix + cellPath.getName)
      // aside-first swap: the cell's rows live in {live} ∪ {aside} at
      // every instant; the aside copy is deleted only after the staged
      // rewrite is in place (or, for a cell whose files held zero rows
      // and so produced no staged dir, after the swap point — dropping
      // the empty cell IS its compaction)
      fs.rename(cellPath, aside)
      if (fs.exists(rewritten)) fs.rename(rewritten, cellPath)
      fs.delete(aside, true)
    }
    fs.delete(staging, true)
    val after = over.map { case (p, _) =>
      if (fs.exists(p)) dataFiles(p).size else 0
    }.sum
    CompactStats(over.size, over.map(_._2).sum, after)
  }
}
