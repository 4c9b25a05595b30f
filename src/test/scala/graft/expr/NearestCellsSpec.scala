package graft.expr

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.SparkSpec

/** [[NearestCells]] — the plan-carried-centroid routing expression the
  * partitioned serve builds and routes with (r17): ordering contract
  * (cosine desc, cid asc), null-cosine semantics (−1.0: zero vectors,
  * length mismatches), interpreted/codegen agreement, and the SQL
  * surface. */
class NearestCellsSpec extends SparkSpec {

  private val cents: Seq[(Int, Array[Double])] = Seq(
    7 -> Array(1.0, 0.0, 0.0),
    3 -> Array(0.0, 1.0, 0.0),
    11 -> Array(0.0, 0.0, 1.0),
    5 -> Array(1.0, 1.0, 0.0))

  /** Brute-force oracle: cosine against every centroid (−1.0 on zero
    * norms / length mismatch), sorted (cos desc, cid asc), first np. */
  private def oracle(v: Array[Double], np: Int): Seq[Int] = {
    def cos(c: Array[Double]): Double = {
      if (c.length != v.length) return -1.0
      val dot = v.zip(c).map { case (a, b) => a * b }.sum
      val d = math.sqrt(v.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum)
      if (d == 0.0) -1.0 else dot / d
    }
    cents.map { case (cid, c) => (cos(c), cid) }
      .sortBy { case (s, cid) => (-s, cid) }.take(np).map(_._2)
  }

  private def viaDataFrame(v: Array[Double], np: Int): Seq[Int] = {
    import spark.implicits._
    Seq(Tuple1(v)).toDF("v")
      .select(GraftFunctions.nearestCells(col("v"), cents, np).as("cids"))
      .as[Seq[Int]].head()
  }

  private def viaInterpreted(v: Array[Double], np: Int): Seq[Int] =
    NearestCells(Literal.create(v, ArrayType(DoubleType)), cents, np)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq

  test("cosine argmax with cid-asc tiebreak, codegen == interpreted == oracle") {
    val vs = Seq(
      Array(0.9, 0.1, 0.0),   // nearest axis-x, then the diagonal
      Array(0.1, 0.9, 0.05),  // nearest axis-y
      Array(1.0, 1.0, 0.0),   // exactly the diagonal; axes tie below it
      Array(-1.0, -1.0, -1.0))
    for (v <- vs; np <- 1 to 5) {
      val exp = oracle(v, np)
      assert(viaDataFrame(v, np) == exp, s"df path, v=${v.toSeq} np=$np")
      assert(viaInterpreted(v, np) == exp, s"eval path, v=${v.toSeq} np=$np")
    }
  }

  test("exact cosine ties resolve to the lower cid") {
    // two IDENTICAL centroids under different cids: score ties exactly,
    // the lower cid must win in every slot ordering
    val dup = Seq(9 -> Array(1.0, 0.0), 2 -> Array(1.0, 0.0),
      4 -> Array(0.0, 1.0))
    import spark.implicits._
    val got = Seq(Tuple1(Array(1.0, 0.1))).toDF("v")
      .select(GraftFunctions.nearestCells(col("v"), dup, 3).as("c"))
      .as[Seq[Int]].head()
    assert(got == Seq(2, 9, 4), s"tie did not break cid-asc: $got")
  }

  test("zero vectors and length mismatches rank every cell -1.0 -> cid asc") {
    assert(viaDataFrame(Array(0.0, 0.0, 0.0), 4) == Seq(3, 5, 7, 11))
    // dim-2 probe against dim-3 centroids: all mismatched -> cid asc
    assert(viaDataFrame(Array(1.0, 2.0), 2) == Seq(3, 5))
  }

  test("a NaN input element ranks every cell -1.0, never phantom cid 0") {
    // ADVICE r17: one NaN element makes every cosine NaN; left unmapped,
    // a NaN never displaces a top-slot and the unfilled Array[Int]
    // defaults would return phantom cid 0 — a REAL cell. Pinned: NaN
    // maps to the -1.0 sentinel, so the result is the cid-asc list
    // (same as the zero-vector case), deterministic, no cid 0.
    assert(viaDataFrame(Array(Double.NaN, 1.0, 0.0), 4) == Seq(3, 5, 7, 11))
    assert(viaInterpreted(Array(Double.NaN, 1.0, 0.0), 2) == Seq(3, 5))
    assert(!viaDataFrame(Array(1.0, Double.NaN, 0.0), 2).contains(0))
  }

  test("SQL surface rejects a wrong-typed vector at analysis time") {
    // ADVICE r17: without checkInputDataTypes a string first argument
    // dies at executor runtime with a ClassCastException; pin the clean
    // analysis-time failure instead
    GraftFunctions.register(spark)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT nearest_cells('oops',
          |  array(1, 2), array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 1)
          |""".stripMargin).collect()
    }
    assert(err.getMessage.toLowerCase.contains("nearest_cells"),
      s"unexpected analysis error: ${err.getMessage}")
  }

  test("nprobe beyond K returns exactly K cids; float input element type") {
    assert(viaDataFrame(Array(1.0, 0.0, 0.0), 99).size == cents.size)
    import spark.implicits._
    val got = Seq(Tuple1(Array(0.9f, 0.1f, 0.0f))).toDF("v")
      .select(GraftFunctions.nearestCells(col("v"), cents, 2).as("c"))
      .as[Seq[Int]].head()
    assert(got == oracle(Array(0.9f, 0.1f, 0.0f).map(_.toDouble), 2))
  }

  test("SQL surface: nearest_cells with literal arrays") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT nearest_cells(array(0.1d, 0.9d),
        |  array(1, 2), array(array(1.0d, 0.0d), array(0.0d, 1.0d)), 1) AS c
        |""".stripMargin).head().getSeq[Int](0)
    assert(got == Seq(2))
  }

  test("routing stays a pure projection inside whole-stage codegen") {
    // the expression exists so routing needs NO join/shuffle/aggregate;
    // pin that a select over it plans as scan+project only
    val df = spark.range(100).select(col("id").cast("int").as("userId"),
      expr("array(cast(id as double), 1.0d, 2.0d)").as("interest"))
    val routed = df.select(col("userId"),
      explode(GraftFunctions.nearestCells(col("interest"), cents, 2)).as("cid"))
    val p = routed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange") && !p.contains("Aggregate") &&
      !p.contains("Join") && !p.contains("Sort"),
      s"routing projection is not projection-only:\n$p")
    assert(p.contains("[codegen id :"), s"no codegen span:\n$p")
    assert(routed.count() == 200)
  }
}
