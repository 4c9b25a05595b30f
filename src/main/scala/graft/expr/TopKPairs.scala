package graft.expr

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-key top-k (score, id) pairs as a typed Aggregator — the
  * bounded-state alternative to the `row_number() OVER (PARTITION BY key
  * ORDER BY score DESC, id)` ranking idiom (q34's plan): the window form
  * SORTS every key's full row set inside its task, while this buffer
  * holds at most k pairs per key, combines map-side, and merges by a
  * two-pointer cut — so a user with a million ratings ships k pairs to
  * the shuffle, not a million-row sort run. Same ordering contract as
  * the window (score desc, id asc — ties deterministic), so q95 shares
  * q34's oracle SQL verbatim.
  */
final class TopKPairs(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  /** score desc, id asc — via [[java.lang.Double.compare]] so NaN ranks
    * LARGEST (raw `>`/`==` are always false for NaN, which would make a
    * NaN score uninsertable), matching Spark's window `ORDER BY score
    * DESC` total order that q95's contract promises. */
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Seq[(Double, Long)] = Vector.empty

  override def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
    if (b.length == k && !lt(a, b.last)) b
    else {
      val ins = b.indexWhere(e => lt(a, e)) match {
        case -1 => b.length
        case i  => i
      }
      val grown = (b.take(ins) :+ a) ++ b.drop(ins)
      if (grown.length > k) grown.take(k) else grown
    }

  override def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0
    var j = 0
    var n = 0
    while (n < k && (i < x.length || j < y.length)) {
      val takeX = j >= y.length || (i < x.length && lt(x(i), y(j)))
      out += (if (takeX) { val v = x(i); i += 1; v }
              else { val v = y(j); j += 1; v })
      n += 1
    }
    out.result()
  }

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKPairs {
  /** Column-ready form: `df.groupBy(key).agg(TopKPairs.agg(k)(score, id))`. */
  def agg(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKPairs(k),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong))
}
