package graft.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cosine_similarity(a, b)` over two array<float>/array<double> columns.
  *
  * Native Catalyst expression with whole-stage codegen (no UDF boundary):
  * the hot scalar of the recommender serve path and the ANN/near-dup
  * operators. Semantics follow the reference's numpy form
  * `dot(a,b)/(norm(a)*norm(b))` (`/root/reference/src/streaming/
  * streaming_rec.py:110-111`) except the `1e-8` guard: a zero-norm input
  * yields NULL (SQL-friendly) rather than a guarded 0, and length-mismatched
  * inputs yield NULL. Accumulation is in double regardless of input element
  * width, matching DuckDB's `list_cosine_similarity` for oracle parity.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  // Input typing: both children must be array<float> or array<double>
  // (AbstractDataType/TypeCollection are private[sql] in Spark 4, so the
  // contract is enforced by the typed GraftFunctions.cosineSimilarity
  // helper rather than ExpectsInputTypes).

  override def dataType: DataType = DoubleType

  // NULL is also produced on zero norms / length mismatch, not only on
  // null inputs — keep codegen honest about it.
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def get(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (tx, ty) = (elemType(left), elemType(right))
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = get(x, i, tx); val yv = get(y, i, ty)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def getter(arr: String, i: String, t: DataType): String = t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv"); val denom = ctx.freshName("denom")
      s"""
        |final int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    final double $xv = ${getter(a, i, elemType(left))};
        |    final double $yv = ${getter(b, i, elemType(right))};
        |    $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
        |  }
        |  final double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
        |  if ($denom == 0.0) { ${ev.isNull} = true; }
        |  else { ${ev.value} = $dot / $denom; }
        |}
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}
