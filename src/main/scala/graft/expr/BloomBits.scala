package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter bit array (Bloom 1970) as a typed `Aggregator`: `m` bits
  * stored 32-per-long (values stay < 2³², so downstream bit tests are
  * plain non-negative integer arithmetic in any engine). Each input is
  * the k pre-hashed bit positions of one element — hashing stays a
  * relational, cross-engine-shared expression — and merge is elementwise
  * OR, the filter-union rule.
  *
  * The built filter is O(m) bits regardless of how many elements went
  * in, which is the decontamination shape that survives scale: q74
  * broadcasts the exact benchmark-gram SET (GBs for a real benchmark
  * suite); q99 broadcasts a few KB of bits and tests corpus grams
  * MAP-SIDE with zero join — at the price of a measured, one-sided
  * false-positive rate (a set bit pattern can flag a clean gram, never
  * the reverse).
  */
final class BloomBits(m: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(m > 0 && m % 32 == 0, s"m must be a positive multiple of 32, got $m")
  private val words = m / 32

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], positions: Array[Long]): Array[Long] = {
    val bits = if (b.length == 0) new Array[Long](words) else b
    var i = 0
    while (i < positions.length) {
      val p = positions(i).toInt
      bits(p >>> 5) |= (1L << (p & 31))
      i += 1
    }
    bits
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length == 0) y
    else if (y.length == 0) x
    else {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }

  override def finish(r: Array[Long]): Array[Long] =
    if (r.length == 0) new Array[Long](words) else r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object BloomBits {
  /** Column-ready form: `df.agg(BloomBits.agg(m)(posCol))` where
    * `posCol` is an `array<bigint>` of bit positions in [0, m). */
  def agg(m: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BloomBits(m),
      ExpressionEncoder[Array[Long]]())
}
