package graft.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `hyperplane_bands(embedding)`: banded random-hyperplane LSH signature
  * in one pass — for each band, an int bucket packing the sign bits of
  * `rowsPerBand` hyperplane dot products.
  *
  * Replaces a `bands × rowsPerBand` tree of `zip_with`+`aggregate`
  * columns (each of which re-walks the embedding and allocates an
  * intermediate array) with a single O(dim · planes) loop over the raw
  * ArrayData — the signature stage stops being allocation-bound.
  * Plane constants are embedded in the expression (not child columns),
  * deterministic, and shared with the generated DuckDB oracle SQL.
  */
case class HyperplaneBands(child: Expression, planes: Array[Array[Double]],
    bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {

  require(planes.length == bands * rowsPerBand)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val n = arr.numElements()
    require(n == planes(0).length,
      s"hyperplane_bands: embedding dim $n != plane dim ${planes(0).length} " +
        "— refusing to truncate (signatures would be silently wrong)")
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var j = 0
      while (j < rowsPerBand) {
        val p = planes(b * rowsPerBand + j)
        var dot = 0.0
        var k = 0
        while (k < n) { dot += v(k) * p(k); k += 1 }
        if (dot > 0) bucket |= (1 << j)
        j += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBands =
    copy(child = c)

  override def prettyName: String = "hyperplane_bands"
}
