package graft

import org.apache.spark.sql.functions._

/** Data-layout behaviors that matter at 100 TB: hive-style partitioned
  * writes with static partition pruning at read, and bucketed-ish
  * pre-partitioning to avoid a shuffle in a repeated join key. */
class PartitionSpec extends SparkSpec {

  test("partitionBy write + partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

    val pruned = spark.read.parquet(dir).where(col("lang") === "es")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang"),
      s"expected partition filters in scan:\n$scan")
    val expected = docs.where(col("lang") === "es").count()
    assert(pruned.count() == expected)
    // only the matching partition directory is listed
    val partDirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(partDirs.exists(_ == "lang=es"))
  }

  test("pre-partitioned (co-located) join reuses the partitioning — no extra shuffle") {
    val ev = Tables.events(spark, sf("sf0.001")).select("event_id", "user_id", "event_type")
    val byUser = ev.repartition(4, col("user_id"))
    val agg = byUser.groupBy("user_id").agg(count(lit(1)).as("n"))
    // the aggregate after an explicit hash-partitioning on the same key
    // must not introduce another Exchange
    val plan = agg.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected exactly the repartition exchange, got $exchanges:\n$plan")
  }
}
