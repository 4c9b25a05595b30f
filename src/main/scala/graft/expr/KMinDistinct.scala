package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The k smallest DISTINCT values of a Long column, as a typed
  * `Aggregator` — the bounded-state core of the KMV distinct-count sketch
  * (Bar-Yossef et al. 2002): a KMV synopsis IS the k-min set of a
  * uniform hash, and keeping it as an aggregate buffer is what makes the
  * sketch a true partial aggregate.
  *
  * State is a sorted array of at most k values, so a partition
  * contributes O(k) bytes to the shuffle no matter how many rows it
  * holds, and merge (two-pointer merge + dedup + cut at k) is exactly
  * the synopsis-union rule the sketch's mergeability promises. This
  * replaces q77's former `row_number() OVER (PARTITION BY event_type
  * ORDER BY h)` plan, which sorted ALL distinct hashes of each event
  * type inside one task — at 100 TB, billions of rows concentrated on a
  * ~5-value key set, in precisely the query whose job is to avoid
  * touching all distinct values.
  *
  * Input values need not be pre-deduplicated: duplicates are absorbed on
  * insert (binary-search membership), so the caller skips the
  * `distinct()` shuffle too.
  */
final class KMinDistinct(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], a: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(b, a)
    if (idx >= 0) b // already present
    else {
      val ins = -idx - 1
      if (b.length < k) {
        val r = new Array[Long](b.length + 1)
        System.arraycopy(b, 0, r, 0, ins)
        r(ins) = a
        System.arraycopy(b, ins, r, ins + 1, b.length - ins)
        r
      } else if (ins < k) { // smaller than the current kth min: displace it
        val r = new Array[Long](k)
        System.arraycopy(b, 0, r, 0, ins)
        r(ins) = a
        System.arraycopy(b, ins, r, ins + 1, k - ins - 1)
        r
      } else b
    }
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(k, x.length + y.length))
    var i = 0
    var j = 0
    var n = 0
    while (n < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) {
          val v = x(i); i += 1; v
        } else {
          val v = y(j); j += 1; v
        }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object KMinDistinct {
  /** Column-ready form: `df.groupBy(...).agg(KMinDistinct.agg(k)(col))`. */
  def agg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new KMinDistinct(k), Encoders.scalaLong)
}
