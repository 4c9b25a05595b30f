package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partitioned layout + partition pruning: the storage-side contract at
  * 100 TB — a year-partitioned table read with a year predicate must
  * touch only that year's files (SURVEY §2.1 S12: "indexes ≈
  * partitioning").
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  test("year-partitioned write is pruned by a year predicate") {
    val dir = Files.createTempDirectory("graft-part").resolve("orders").toString
    val orders = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("y", year($"o_orderdate"))
    orders.write.partitionBy("y").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).where($"y" === 1996)
    val plan = pruned.queryExecution.executedPlan.toString

    // the scan must carry the partition predicate, not a data filter
    assert(plan.contains("PartitionFilters") && plan.contains("1996"),
      s"no partition pruning in plan:\n$plan")
    // and only the matching partition directory is read
    val expected = orders.where($"y" === 1996).count()
    assert(pruned.count() == expected && expected > 0)
    val years = pruned.select("y").distinct().as[Int].collect()
    assert(years.toSeq == Seq(1996))
  }
}
