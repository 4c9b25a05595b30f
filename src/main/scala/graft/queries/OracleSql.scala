package graft.queries

/** Shared DuckDB-side SQL fragments that must stay bit-identical to
  * their Spark counterparts — single definition so the two catalogs
  * that use the md5-prefix hash cannot drift apart.
  */
private[queries] object OracleSql {

  /** 32-bit string hash from the md5 hex prefix (DuckDB has no conv();
    * mirrors Spark's `conv(substr(md5(s),1,8),16,10)` exactly). `s` is a
    * SQL expression string. */
  def h32(s: String): String =
    (1 to 8).map { i =>
      val pow = math.pow(16, 8 - i).toLong
      s"(strpos('0123456789abcdef', substr(md5($s), $i, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")
}
