package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `adc_cosine(query, codes)` — asymmetric-distance cosine APPROXIMATION
  * of a raw query vector against a PQ-CODED candidate (Jégou et al.
  * 2011's ADC), with the per-subspace codebooks carried inside the
  * expression as one plan-carried model (s × k × subDim doubles —
  * ~2 MB at s=4, k=256, subDim=16).
  *
  * The candidate's code words address codebook entries that encode the
  * candidate's UNIT vector ([[NearestCodes]]'s contract), and the query
  * is normalized internally, so the summed squared sub-distances
  * approximate |û − v̂|² = 2 − 2·cos and the returned score is
  * 1 − adist/2 ≈ cosine — same orientation and [−1, 1] range as
  * [[CosineSimilarity]], so the serve's ranking tail is reused
  * unchanged. Per row the cost is s·subDim multiply-adds — the SAME
  * flop count as an exact cosine at equal dim — but the scanned
  * candidate column is s ints instead of dim doubles (~25× fewer bytes
  * at dim 64), which is the entire point at the 20M-item serve where
  * touched-cell DECODE I/O is the measured bound (SURVEY §8.13).
  *
  * Null semantics match [[CosineSimilarity]]'s: a zero/NaN-norm query,
  * a code array of the wrong arity, or an out-of-range code id returns
  * null (the serve filters nulls before ranking).
  */
case class AdcCosine(left: Expression, right: Expression,
                     codebooks: Seq[Seq[Array[Double]]])
    extends BinaryExpression {
  require(codebooks.nonEmpty, "adc_cosine: no codebooks")
  require(codebooks.forall(_.nonEmpty), "adc_cosine: empty codebook")
  // ragged centroids would AIOOBE mid-scan on executors; fail at
  // construction (= analysis time on the SQL surface) instead
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "adc_cosine: codebook centroids must all have the same length (got " +
      codebooks.map(_.map(_.length).distinct.mkString("/")).mkString(", ") + ")")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_cosine requires (array<float|double> query, array<int> codes), " +
        s"got (${l.catalogString}, ${r.catalogString})")
  }

  @transient private lazy val elemIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  @transient private lazy val subDim: Int = codebooks.head.head.length
  @transient private lazy val cents: Array[Array[Array[Double]]] =
    codebooks.map(_.toArray).toArray

  /** Shared by interpreted eval and generated code; null → java null. */
  def score(q: ArrayData, codes: ArrayData): java.lang.Double = {
    val s = cents.length
    if (codes.numElements() != s) return null
    val n = q.numElements()
    val v = new Array[Double](n)
    var vn = 0.0
    var i = 0
    while (i < n) {
      val x = if (elemIsFloat) q.getFloat(i).toDouble else q.getDouble(i)
      v(i) = x; vn += x * x; i += 1
    }
    vn = math.sqrt(vn)
    if (vn == 0.0 || java.lang.Double.isNaN(vn)) return null
    val inv = 1.0 / vn
    var adist = 0.0
    var sub = 0
    while (sub < s) {
      val cb = cents(sub)
      val code = codes.getInt(sub)
      if (code < 0 || code >= cb.length) return null
      val c = cb(code)
      val off = sub * subDim
      var j = 0
      while (j < subDim) {
        val x = (if (off + j < n) v(off + j) * inv else 0.0) - c(j)
        adist += x * x; j += 1
      }
      sub += 1
    }
    if (java.lang.Double.isNaN(adist)) null else 1.0 - adist / 2.0
  }

  override def nullSafeEval(q: Any, codes: Any): Any =
    score(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("adcCosine", this, classOf[AdcCosine].getName)
    // freshName, not a fixed local: nullSafeCodeGen inlines this snippet
    // without a scoping block when a child is non-nullable, so a fixed
    // `r` would collide with a sibling AdcCosine (or any neighbor) in
    // the same codegen scope — a janino duplicate-variable error and a
    // silent whole-stage fallback (ADVICE r18)
    val r = ctx.freshName("adcScore")
    nullSafeCodeGen(ctx, ev, (q, c) => s"""
      java.lang.Double $r = $selfRef.score($q, $c);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): AdcCosine = copy(left = newLeft, right = newRight)

  override def prettyName: String = "adc_cosine"
}
