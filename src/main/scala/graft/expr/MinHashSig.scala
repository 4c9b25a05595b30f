package graft.expr

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(text)`: the full K-permutation MinHash signature (Broder
  * 1997) of a document's character `shingleK`-gram multiset, in one pass
  * over the string — an array of K minima `min((a_k·h(s) + b_k) mod p)`.
  *
  * This replaces the explode → hash → 16-way-min-groupBy composition: a
  * signature is a pure per-row function of the text, so computing it
  * inside one expression turns a `docs × shingles-per-doc`-row shuffle
  * (the dominant cost of the old q28 plan — ~7.5M rows at sf0.1) into a
  * scan-bound map with NO shuffle at all. At 100 TB that is the
  * difference between a signature stage bounded by the parquet scan and
  * one bounded by a multi-TB exchange.
  *
  * Parity contract (shared with the DuckDB oracle, see
  * `TextOps.h32`/`OracleSql.h32`): h(s) = first 8 hex chars of md5(s)
  * parsed as a base-16 BIGINT = the first 4 digest bytes big-endian
  * unsigned. Shingles iterate by code points exactly like
  * [[CharShingles]], matching DuckDB `substr` semantics. `a·h + b` fits
  * exactly in a long (a,b < 2²⁰, h < 2³²), so the mod is exact on both
  * engines. Returns null when the text has fewer than `shingleK` code
  * points (no shingles → no signature), matching the groupBy
  * composition's absent row.
  */
case class MinHashSig(child: Expression, shingleK: Int,
    coefs: Array[(Long, Long)], p: Long)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val cp = s.codePointCount(0, s.length)
    val n = cp - shingleK + 1
    if (n <= 0) return null
    val offsets = new Array[Int](cp + 1)
    var off = 0
    var idx = 0
    while (idx < cp) {
      offsets(idx) = off
      off = s.offsetByCodePoints(off, 1)
      idx += 1
    }
    offsets(cp) = s.length
    val md = MessageDigest.getInstance("MD5")
    val k = coefs.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val bytes = s.substring(offsets(i), offsets(i + shingleK))
        .getBytes(StandardCharsets.UTF_8)
      val d = md.digest(bytes) // digest() resets the instance for reuse
      val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < k) {
        val v = (coefs(j)._1 * hv + coefs(j)._2) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)

  override def prettyName: String = "minhash_sig"
}
