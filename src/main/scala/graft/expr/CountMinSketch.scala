package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a typed
  * `Aggregator`: `d` hash rows × `w` counters, flattened to one
  * `Array[Long]` of `d·w` cells. Each input is the d pre-hashed cell
  * indexes (`i·w + bucket_i`) of ONE occurrence — the hashing stays a
  * relational, cross-engine-shared expression (the md5-prefix family),
  * so the sketch contents are bit-identical to an oracle that sums
  * counts per (row, bucket) in SQL.
  *
  * State is O(d·w) regardless of input size, merge is elementwise add —
  * a TRUE partial aggregate: every map task ships one d·w table, never
  * its token stream, which is what makes frequency estimation affordable
  * when the corpus is 100 TB but d·w is a few KB. The point estimate
  * `min_i cells[i·w + bucket_i(x)]` (computed relationally downstream)
  * never underestimates; q98 reports estimate vs exact for the corpus's
  * own top tokens, the q66/q67 acceptance idiom.
  */
final class CountMinSketch(d: Int, w: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  require(d > 0 && w > 0, s"d and w must be positive, got d=$d w=$w")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], idxs: Array[Long]): Array[Long] = {
    val cells = if (b.length == 0) new Array[Long](d * w) else b
    var i = 0
    while (i < idxs.length) {
      cells(idxs(i).toInt) += 1L
      i += 1
    }
    cells
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    if (x.length == 0) y
    else if (y.length == 0) x
    else {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }

  override def finish(r: Array[Long]): Array[Long] =
    if (r.length == 0) new Array[Long](d * w) else r

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  /** Column-ready form: `df.agg(CountMinSketch.agg(d, w)(posCol))` where
    * `posCol` is an `array<bigint>` of the d flattened cell indexes. */
  def agg(d: Int, w: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new CountMinSketch(d, w),
      ExpressionEncoder[Array[Long]]())
}
