package graft.io

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing: the shuffle-elimination story for repeated co-located joins
  * (SURVEY §4.2 / brief "co-located joins via bucketing"). Both sides
  * bucketed+sorted on the join key → Catalyst plans a sort-merge join
  * with ZERO exchanges; at 100 TB this is the difference between joining
  * in place and re-shuffling the fact table every query.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join plans without any shuffle exchange") {
    val left = (1 to 10000).map(i => (i % 97, i)).toDF("k", "v")
    val right = (1 to 5000).map(i => (i % 97, s"name$i")).toDF("k", "name")
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")
    left.write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_left")
    right.write.bucketBy(8, "k").sortBy("k").saveAsTable("bkt_right")

    val joined = spark.table("bkt_left").join(spark.table("bkt_right"), Seq("k"))
    val plan = joined.queryExecution.executedPlan
    val exchanges = plan.collect { case e: ShuffleExchangeExec => e }
    assert(exchanges.isEmpty,
      s"expected shuffle-free co-located join, got:\n$plan")

    // and the result is still correct vs the plain (shuffling) join
    val expected = left.join(right, Seq("k")).count()
    assert(joined.count() == expected)
  }
}
