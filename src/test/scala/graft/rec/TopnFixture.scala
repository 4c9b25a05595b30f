package graft.rec

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ml-100k-SHAPED interaction fixture for the top-N quality anchor.
  *
  * AlsSpec/GdMfSpec's rating-VALUE fixture (seeded latent-factor family)
  * is the right shape for RMSE anchors, but a top-N metric is about
  * which (user, item) pairs EXIST: P@20/R@20 on ml-100k is only
  * reachable because real interaction data is popularity-skewed (the
  * most-rated ml-100k movie is rated by 62% of users; the median movie
  * by ~3%) — under a uniform interaction draw no ranker beats
  * n_test/n_items ≈ 0.0125 in expectation, so the published 0.4133
  * would be unreachable by ANY model and the anchor meaningless. This
  * fixture therefore draws items Zipf(`itemZipf`) and users
  * Zipf(`userZipf`) (long-tailed activity, like ml-100k's 20–737
  * ratings/user), dedups pairs, and keeps the latent-factor rating
  * values — the same seeded-family idiom, extended to the interaction
  * distribution.
  */
object TopnFixture {

  /** 943 users × 1682 items, ~100k distinct interactions (draws capped
    * at 6× the target; saturation of head items under heavy skew makes
    * exact 100k unreachable for itemZipf ≳ 1.2). Deterministic in
    * `seed`. */
  def ml100kShaped(spark: SparkSession, seed: Long, itemZipf: Double,
                   userZipf: Double): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val nU = 943; val nI = 1682; val rank = 8
    val bu = Array.fill(nU + 1)(rnd.nextGaussian() * 0.45)
    val bi = Array.fill(nI + 1)(rnd.nextGaussian() * 0.45)
    val uf = Array.fill(nU + 1)(Array.fill(rank)(rnd.nextGaussian() * 0.25))
    val vf = Array.fill(nI + 1)(Array.fill(rank)(rnd.nextGaussian() * 0.25))
    // Zipf inverse-CDF over 1..n with exponent s
    def cdf(n: Int, s: Double): Array[Double] = {
      val w = Array.tabulate(n)(i => math.pow(i + 1.0, -s))
      val c = w.scanLeft(0.0)(_ + _).drop(1)
      val t = c(n - 1)
      c.map(_ / t)
    }
    def draw(c: Array[Double]): Int = {
      val x = rnd.nextDouble()
      val i = java.util.Arrays.binarySearch(c, x)
      (if (i >= 0) i else -i - 1) + 1
    }
    val ci = cdf(nI, itemZipf)
    val cu = cdf(nU, userZipf)
    val seen = scala.collection.mutable.HashSet.empty[(Int, Int)]
    val rows = Seq.newBuilder[(Long, Long, Double)]
    var n = 0; var attempts = 0
    while (n < 100000 && attempts < 600000) {
      attempts += 1
      val u = draw(cu); val i = draw(ci)
      if (seen.add((u, i))) {
        n += 1
        val mu = 3.53 + bu(u) + bi(i) +
          uf(u).zip(vf(i)).map { case (a, b) => a * b }.sum +
          rnd.nextGaussian() * 0.845
        rows += ((u.toLong, i.toLong,
          math.min(5.0, math.max(1.0, math.round(mu).toDouble))))
      }
    }
    rows.result().toDF("user_id", "item_id", "rating")
  }
}

/** Dev-loop sweep harness for the P@20/R@20 anchor (not a test):
  * `sbt "Test/runMain graft.rec.TopnSweep <itemZipf> <userZipf> <rank>
  * <lr> <reg> <epochs> <posMin>"` prints the metric row for one
  * config. */
object TopnSweep {
  def main(args: Array[String]): Unit = {
    val Seq(itemZipf, userZipf, lr, reg, posMin) =
      Seq(args(0), args(1), args(3), args(4), args(6)).map(_.toDouble)
    val rank = args(2).toInt; val epochs = args(5).toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .appName("topn-sweep").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ratings = TopnFixture.ml100kShaped(spark, seed = 11L, itemZipf, userZipf)
    val Array(train, test) = ratings.randomSplit(Array(0.8, 0.2), seed = 42L)
    train.cache(); test.cache()
    val nTriples = GradientMF.bprAllPosTriples(train, posMin).count()
    def report(tag: String, uf: org.apache.spark.sql.DataFrame,
               vf: org.apache.spark.sql.DataFrame): Unit = {
      val row = graft.queries.Recommender
        .topNMetric(uf, vf, train, test, k = 20, probeLimit = 0,
          width = rank + 1) // all-pos trainer carries the item-bias slot
        .collect()(0)
      println(s"RESULT $tag itemZipf=$itemZipf userZipf=$userZipf rank=$rank " +
        s"lr=$lr reg=$reg epochs=$epochs posMin=$posMin " +
        s"n=${ratings.count()} triples=$nTriples " +
        s"users=${row.getLong(0)} p20=${row.getDouble(1)} r20=${row.getDouble(2)}")
    }
    // popularity ORACLE: rank-1 factors u=[1], v=[train count] — the
    // fixture's exploitable ceiling without personalization
    import org.apache.spark.sql.functions._
    val popV = train.groupBy(col("item_id"))
      .agg(array(count(lit(1)).cast("double")).as("val"))
    val popU = train.select(col("user_id")).distinct()
      .select(col("user_id"), array(lit(1.0)).as("val"))
    report("POP", popU, popV)
    val (uf0, vf0) = GradientMF.bprTrainedFactorsAllPos(
      train, rank, lr, reg, epochs = 0, posMin = posMin)
    report("INIT", uf0, vf0)
    val (uf, vf) = GradientMF.bprTrainedFactorsAllPos(
      train, rank, lr, reg, epochs, posMin)
    report("TRAINED", uf, vf)
    spark.stop()
  }
}
