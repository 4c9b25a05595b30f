package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `char_shingles(text, k)`: all overlapping character k-grams of a
  * string, in one pass.
  *
  * Replaces the `explode(sequence(...))` + `substring(text, i, k)`
  * composition, which is O(len²) per document — each substring call
  * re-scans the string for the char offset of position i. This expression
  * walks the string once (O(len·k)), which at 100 TB of documents is the
  * difference between a scan-bound and a CPU-bound shingling stage.
  * (CodegenFallback: it sits behind an explode, which already bounds the
  * whole-stage-codegen span.)
  */
case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // iterate by code points, not UTF-16 units: supplementary characters
    // (emoji, CJK extensions) must not be surrogate-split, and the DuckDB
    // oracle's substr/length count code points
    val cp = s.codePointCount(0, s.length)
    val n = cp - k + 1
    if (n <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val offsets = new Array[Int](cp + 1)
      var off = 0
      var idx = 0
      while (idx < cp) {
        offsets(idx) = off
        off = s.offsetByCodePoints(off, 1)
        idx += 1
      }
      offsets(cp) = s.length
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = UTF8String.fromString(s.substring(offsets(i), offsets(i + k)))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(c: Expression): CharShingles =
    copy(child = c)

  override def prettyName: String = "char_shingles"
}
