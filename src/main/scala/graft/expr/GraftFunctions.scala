package graft.expr

import org.apache.spark.sql.{Column, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level function surface of the engine (SURVEY §2.8).
  *
  * Everything here is either a composition of codegen'd built-ins or a
  * native Catalyst expression registered on the session — never a Scala
  * closure UDF, so whole-stage codegen spans are preserved.
  */
object GraftFunctions {

  /** Idempotent per-session registration of native expressions, enabling
    * both SQL (`SELECT cosine_similarity(a,b)`) and `call_function` use.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", exprs => CosineSimilarity(exprs(0), exprs(1)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_shingles",
      exprs => CharShingles(exprs.head, shingleWidth(exprs(1))),
      "built-in")
    spark.udf.register("rmse_agg",
      udaf(RmseAggregator, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)))
    // the bounded-state synopsis aggregates (q77 / q95) on the SQL
    // surface, at their catalog parameterizations
    spark.udf.register("kmin_distinct64",
      udaf(new KMinDistinct(64), Encoders.scalaLong))
    spark.udf.register("top3_pairs",
      udaf(new TopKPairs(3),
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)))
    // frequency / membership synopses (q98 / q99) at their catalog
    // parameterizations; both take a pre-hashed array<bigint> of
    // positions, so the hash family stays a shared relational expression
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    spark.udf.register("cms_4x256",
      udaf(new CountMinSketch(4, 256), ExpressionEncoder[Array[Long]]()))
    spark.udf.register("bloom_2048",
      udaf(new BloomBits(2048), ExpressionEncoder[Array[Long]]()))
    // distinct-count registers (q108); takes the pre-encoded
    // bucket*32+rho slot, so bucketing/rank stay shared relational
    // expressions like the CMS/Bloom hash families
    spark.udf.register("hll_64",
      udaf(new HllRegisters(64), Encoders.scalaLong))
  }

  /** One-pass character k-gram shingling (see [[CharShingles]]); requires
    * [[register]] on the session first. */
  def charShingles(text: Column, k: Int): Column =
    call_function("char_shingles", text, lit(k))

  /** The k argument of char_shingles must be a foldable integer literal;
    * fail with a message naming the contract instead of a bare cast error.
    */
  private[expr] def shingleWidth(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    val v = try e.eval() catch {
      case t: Throwable => throw new IllegalArgumentException(
        "char_shingles(text, k): k must be a constant integer literal", t)
    }
    v match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"char_shingles(text, k): k must be a constant integer literal, got $other")
    }
  }

  /** Native cosine similarity (see [[CosineSimilarity]]); requires
    * [[register]] on the session first. */
  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  /** Dot product via built-ins (`zip_with` + `aggregate`) — the pure
    * composition alternative (SURVEY §4.3 preference (a)). */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** Euclidean norm of an array column. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))

  /** F6 multi-hot genre encoding (ref `/root/reference/src/streaming/
    * streaming_rec.py:130-134`): `sep`-packed token string → fixed-vocab
    * 0/1 vector, as a pure built-in composition.
    */
  def multiHot(packed: Column, vocab: Seq[String], sep: String = "\\|"): Column = {
    val toks = split(packed, sep)
    array(vocab.map(v => array_contains(toks, lit(v)).cast("int")): _*)
  }

  /** F9 interest-vector blend `U := (1-λr)·U + (λr)·T` (ref
    * `/root/reference/src/streaming/streaming_rec.py:83-99`; λ defaults to
    * the code's 0.05 — the reference's docstring says 0.8, SURVEY §7.4).
    */
  def blendInterest(u: Column, t: Column, r: Column, lambda: Double = 0.05): Column =
    zip_with(u, t, (uv, tv) => uv * (lit(1.0) - lit(lambda) * r) + tv * (lit(lambda) * r))
}
