package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The md5-prefix 32-bit hash, BOTH sides, in one file: the Spark
  * `Column` form and the DuckDB SQL fragment must stay bit-identical
  * (it is the cross-engine "uniform random" every deterministic
  * sampling/sharding query ranks by), so the single definition of each
  * lives here and the per-catalog objects only alias them — a tweak to
  * one side cannot silently miss the other.
  */
private[queries] object OracleSql {

  /** 32-bit string hash — Spark side: `conv(substr(md5(c),1,8),16,10)`
    * as a long Column. */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Same hash — DuckDB side (DuckDB has no conv(); the digit unroll
    * mirrors the Spark form exactly). `s` is a SQL expression string. */
  def h32(s: String): String =
    (1 to 8).map { i =>
      val pow = math.pow(16, 8 - i).toLong
      s"(strpos('0123456789abcdef', substr(md5($s), $i, 1)) - 1) * $pow"
    }.mkString("(", " + ", ")")
}
