package graft

/** Session-scoped memos (q72's converged labels, q83's on-disk IVF
  * index dirs) hold artifacts that strongly reference their
  * SparkSession, so a stopped session's entries must be evicted or the
  * session object graph — and the index's disk — leaks for the driver's
  * lifetime. [[SessionIds]] fires registered evictors on context stop;
  * this drives the eviction directly (stopping the shared test session
  * would kill every other suite) and asserts both memos let go.
  */
class SessionEvictionSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("session eviction drops memo entries and reclaims index dirs") {
    // populate both session-keyed memos
    queries.TextOps.dedupComponents.run(spark, sfDir).count()
    queries.Similarity.ivfIndexProbe.run(spark, sfDir).count()
    queries.Similarity.pqIndexProbe.run(spark, sfDir).count()
    assert(queries.TextOps.labelMemoEntries >= 1)
    assert(queries.TextOps.sigMemoEntries >= 1)
    val dirs = queries.Similarity.indexMemoDirs
    assert(dirs.size >= 2, "expected both the IVF and PQ index memos")
    dirs.foreach { d =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(d)),
        s"index dir missing before eviction: $d")
    }

    SessionIds.fireEviction(SessionIds.of(spark))

    assert(queries.TextOps.labelMemoEntries == 0,
      "label memo kept entries for the evicted session")
    assert(queries.TextOps.sigMemoEntries == 0,
      "signature memo kept entries for the evicted session")
    assert(queries.Similarity.indexMemoDirs.isEmpty,
      "index memo kept entries for the evicted session")
    dirs.foreach { d =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(d)),
        s"index dir not reclaimed on eviction: $d")
    }

    // memos must transparently rebuild for a live session after a spurious
    // eviction — getOrElseUpdate repopulates, nothing is poisoned
    assert(queries.Similarity.ivfIndexProbe.run(spark, sfDir).count() > 0)
    assert(queries.Similarity.indexMemoDirs.nonEmpty)
  }
}
