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

  test("star-schema query: dims broadcast, fact filter pushed to the scan") {
    val df = ops.Joins.joinStarSchema.build(spark, sf("sf0.01"))
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast joins for the small dims:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "star-schema query must stay on equi joins")
    // the o_orderdate range predicate must reach the orders parquet scan
    val scans = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val ordersScan = scans.find(_.contains("orders.parquet"))
    assert(ordersScan.exists(s => s.contains("PushedFilters") && s.contains("o_orderdate")),
      s"o_orderdate filter not pushed to scan:\n${ordersScan.getOrElse("no orders scan")}")
  }

  test("layout-managed sink: partitioned, sorted within files, bounded file size") {
    // the write side of a 100 TB pipeline: hive-partitioned by a low-
    // cardinality key, rows sorted within each file (enables parquet
    // min/max row-group skipping on doc_id probes downstream), and
    // maxRecordsPerFile bounding task outputs.
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val docs = Tables.documents(spark, sf("sf0.001")).select("doc_id", "lang", "n_chars")
    docs.repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 40)
      .partitionBy("lang").parquet(dir)
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    langs.foreach { l =>
      val files = new java.io.File(s"$dir/lang=$l").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty, s"no files for lang=$l")
      files.foreach { f =>
        val rows = spark.read.parquet(f.getPath).select("doc_id")
          .collect().map(_.getLong(0))
        assert(rows.length <= 40, s"${f.getName}: ${rows.length} rows > maxRecordsPerFile")
        assert(rows.sameElements(rows.sorted), s"${f.getName} not sorted on doc_id")
      }
    }
    // round-trip completeness
    assert(spark.read.parquet(dir).count() == docs.count())
  }

  test("priority top-k: limit-on-aggregate plans as TakeOrderedAndProject") {
    val df = ops.Joins.joinPriorityTopk.build(spark, sf("sf0.01"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected per-partition top-k merge, not a global sort:\n$plan")
  }

  test("bucketed tables: equi-join on the bucket key plans with NO exchange") {
    // bucketBy + saveAsTable through the in-memory catalog: both sides
    // bucketed 8 ways on the join key — the join must read buckets
    // co-located and skip the shuffle entirely. At 100 TB this is the
    // difference between re-shuffling two fact tables per join and
    // joining in place (the layout cost is paid once, at write time).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val o = Tables.orders(spark, sf("sf0.001")).select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(spark, sf("sf0.001")).select("l_orderkey", "l_quantity")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_orders_b")
      l.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_lineitem_b")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      val expected = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
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

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the third leg of the join-pruning story (broadcast → bucketed →
    // RUNTIME): when a shuffle join's build side is selective, Spark
    // can seed a bloom filter from it and probe the fact side BEFORE
    // the exchange, shrinking the shuffle by the filter's selectivity —
    // at 100 TB this is the difference between shuffling the corpus
    // and shuffling the matching slice. Pin that the rewrite engages on
    // this build (thresholds scaled to fixture size; the 10 GB
    // application-side default assumes a real cluster).
    val conf = spark.conf
    val touched = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = touched.map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      val o = Tables.orders(spark, sf("sf0.001"))
        .where(col("o_totalprice") < lit(1000.0)) // selective build side
        .select("o_orderkey", "o_totalprice")
      val l = Tables.lineitem(spark, sf("sf0.001"))
        .select("l_orderkey", "l_quantity")
      val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"runtime bloom filter did not engage:\n$plan")
      // and it must not change results
      val expected = Tables.lineitem(spark, sf("sf0.001"))
        .join(Tables.orders(spark, sf("sf0.001"))
          .where(col("o_totalprice") < lit(1000.0)),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally touched.foreach(k => saved(k).fold(conf.unset(k))(conf.set(k, _)))
  }

  test("AQE skew-join splits the hot partition of a shuffle join (C11-AQE)") {
    // r6 verdict item 6: manual salting (C11/D13) is proven, but at
    // 100x a user reaches for spark.sql.adaptive.skewJoin FIRST — this
    // pins that it actually engages on this build, and PLANS.md
    // §C11-AQE + the Joins.scala note record when salting still wins
    // (broadcast-ineligible small sides that never shuffle, skew known
    // ahead of time, deterministic plans, aggregation keys).
    val conf = spark.conf
    val touched = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = touched.map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      // force a shuffle join (AQE's OptimizeSkewedJoin only applies to
      // shuffle joins) and scale the detection thresholds down to the
      // test's data size — the same knobs, just MBs instead of the
      // 256 MB cluster default
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      // one hot key carries 100k of 101k big-side rows
      val big = spark.range(100000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(1000).select((col("id") % 100 + 1).as("k"), col("id").as("v")))
      val small = spark.range(101).select(col("id").as("k2"), (col("id") * 7).as("w"))
      val joined = big.join(small, col("k") === col("k2"))
      assert(joined.count() == 101000L) // skew split must not change results
      joined.collect() // finalize THIS df's adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"AQE did not split the skewed partition:\n$plan")
    } finally touched.foreach(k => saved(k).fold(conf.unset(k))(conf.set(k, _)))
  }
}
