package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runs `scripts/audit_oracle_casts.py` (DuckDB integer-widening audit,
  * VERDICT r9 item 6) as part of the suite: the selftest proves the
  * audit still catches its seeded counterexamples, then the FULL oracle
  * catalog is audited — so a window-`sum` whose HUGEINT survives to an
  * output schema fails `sbt test` before it can fail the driver's
  * round (the r7 q103 bite, twice was enough). Pure JVM + a python3
  * subprocess; no SparkSession.
  */
class OracleAuditSpec extends AnyFunSuite {

  private def run(args: String*): (Int, String) = {
    val pb = new ProcessBuilder(args: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private val script = {
    val f = new java.io.File("scripts/audit_oracle_casts.py")
    assert(f.exists(), s"audit script missing at ${f.getAbsolutePath}")
    f.getAbsolutePath
  }

  test("audit selftest flags the seeded counterexamples") {
    val (rc, out) = run("python3", script, "--selftest")
    assert(rc == 0, s"selftest failed:\n$out")
    assert(out.contains("selftest OK"), out)
  }

  test("oracle catalog is free of DuckDB integer-widening leaks") {
    val json = java.nio.file.Files.createTempFile("oracle_sql", ".json")
    java.nio.file.Files.writeString(json, Verify.oracleJson())
    val (rc, out) = run("python3", script, "/root/testdata/sf0.001",
      json.toString)
    assert(rc == 0, s"audit flagged oracle SQL:\n$out")
    info(out.linesIterator.toSeq.takeRight(2).mkString(" "))
  }
}
