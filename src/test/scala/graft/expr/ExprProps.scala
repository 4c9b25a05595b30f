package graft.expr

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.TestSpark
import graft.stream.StreamOps

/** ScalaCheck properties (SURVEY §5.2) for the engine's scalar layer.
  * Spark-evaluated properties keep case counts small (each case is a
  * job); pure-function properties run the full default 100.
  */
object ExprProps extends Properties("graft.expr") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val vecGen: Gen[Array[Double]] =
    Gen.choose(2, 12).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-5.0, 5.0)).map(_.toArray))

  private val pairGen: Gen[(Array[Double], Array[Double])] =
    vecGen.flatMap(a => Gen.listOfN(a.length, Gen.choose(-5.0, 5.0))
      .map(b => (a, b.toArray)))

  property("cosine ∈ [-1,1], symmetric, self-similarity 1") =
    forAll(Gen.listOfN(4, pairGen)) { pairs =>
      pairs.isEmpty || {
        val rows = pairs.toDF("a", "b")
          .select(
            GraftFunctions.cosineSimilarity($"a", $"b").as("ab"),
            GraftFunctions.cosineSimilarity($"b", $"a").as("ba"),
            GraftFunctions.cosineSimilarity($"a", $"a").as("aa"))
          .as[(Option[Double], Option[Double], Option[Double])].collect()
        rows.forall {
          case (Some(ab), Some(ba), Some(aa)) =>
            ab >= -1 - 1e-9 && ab <= 1 + 1e-9 &&
              math.abs(ab - ba) < 1e-12 && math.abs(aa - 1) < 1e-12
          case (None, None, _) => true // zero-norm vector: NULL both ways
          case _ => false
        }
      }
    }

  property("char_shingles(k) == text.sliding(k)") =
    forAll(Gen.alphaNumStr.suchThat(_.length <= 40), Gen.choose(2, 6)) {
      (text, k) =>
        val got = Seq(text).toDF("t")
          .select(GraftFunctions.charShingles($"t", k))
          .as[Seq[String]].head()
        val expected =
          if (text.length < k) Seq.empty
          else text.sliding(k).toSeq
        got == expected
    }

  // pure-function properties: full case count
  property("blend is a convex combination staying within bounds") =
    forAll(pairGen, Gen.choose(0.0, 5.0)) { case ((u, t), r) =>
      val lambda = 0.05
      val out = StreamOps.blend(u, t, r, lambda)
      // when λr ≤ 1 the blend is convex (stays between u and t per
      // coordinate); beyond that it extrapolates (reference semantics)
      out.zip(u.zip(t)).forall { case (o, (uv, tv)) =>
        lambda * r > 1.0 ||
          (o >= math.min(uv, tv) - 1e-9 && o <= math.max(uv, tv) + 1e-9)
      }
    }

  property("blend with r=0 is identity; λr=1 jumps fully to target") =
    forAll(pairGen) { case (u, t) =>
      val id = StreamOps.blend(u, t, 0.0, 0.05)
      val full = StreamOps.blend(u, t, 20.0, 0.05) // λr = 1
      id.sameElements(u) &&
        full.zip(t).forall { case (o, tv) => math.abs(o - tv) < 1e-9 }
    }

  property("multiHot marks exactly the vocab tokens present") =
    forAll(Gen.someOf(Seq("Action", "Comedy", "Drama", "Horror", "War"))) {
      chosen =>
        val vocab = Seq("Action", "Comedy", "Drama", "Horror", "War")
        val packed = chosen.mkString("|")
        val got = Seq(packed).toDF("g")
          .select(GraftFunctions.multiHot($"g", vocab))
          .as[Seq[Int]].head()
        got == vocab.map(v => if (chosen.contains(v)) 1 else 0)
    }
}
