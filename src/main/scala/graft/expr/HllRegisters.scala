package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog register table (Flajolet et al. 2007) as a typed
  * `Aggregator`: `m` registers, each the MAX leading-zero rank (rho)
  * seen in its bucket. The input is one pre-encoded slot per element —
  * `bucket * 32 + rho` — so bucketing and rank stay relational,
  * cross-engine-shared expressions over the shared 32-bit hash (the
  * same family discipline as [[CountMinSketch]] / [[BloomBits]]: the
  * aggregator holds STATE, never hashes).
  *
  * State is O(m) regardless of input size and merge is elementwise max
  * — the HLL union rule — making this a true partial aggregate: each
  * map task ships m longs per group, and the same property is what
  * lets the register table live in a streaming state store. Unlike
  * `approx_count_distinct` (whose HLL++ registers and estimator are
  * implementation-private, so Spark's and DuckDB's built-ins can never
  * hash-match), the registers here are plain data and the estimator is
  * spelled explicitly in the query — which is what makes an HLL
  * oracle-checkable at all (q108).
  */
final class HllRegisters(m: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(m > 0, s"m must be positive, got $m")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], slot: Long): Array[Long] = {
    val regs = if (b.length == 0) new Array[Long](m) else b
    val bucket = (slot >>> 5).toInt
    val rho = slot & 31L
    require(bucket < m, s"bucket $bucket out of range (m=$m)")
    if (rho > regs(bucket)) regs(bucket) = rho
    regs
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length == 0) y
    else if (y.length == 0) x
    else {
      var i = 0
      while (i < x.length) { if (y(i) > x(i)) x(i) = y(i); i += 1 }
      x
    }

  override def finish(r: Array[Long]): Array[Long] =
    if (r.length == 0) new Array[Long](m) else r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object HllRegisters {
  /** Column-ready form: `df.agg(HllRegisters.agg(m)(slotCol))` where
    * `slotCol` is the encoded `bucket * 32 + rho` long. */
  def agg(m: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new HllRegisters(m),
      org.apache.spark.sql.Encoders.scalaLong)
}
