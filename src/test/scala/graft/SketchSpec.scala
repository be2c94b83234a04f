package graft

import org.apache.spark.sql.functions._

import graft.functions.KmvDistinct
import graft.ops.Salted

/** KMV sketch accuracy/mergeability and salted-aggregation equivalence. */
class SketchSpec extends SparkSpec {

  test("KMV distinct estimate within 15% of exact (k=256, mergeable across partitions)") {
    val kmv = udaf(new KmvDistinct(256))
    val li = Tables.lineitem(spark, sf("sf0.01")).repartition(8)
    val row = li.agg(
      kmv(xxhash64(col("l_partkey"))).as("est"),
      countDistinct(col("l_partkey")).as("exact")).collect()(0)
    val est = row.getLong(0).toDouble
    val exact = row.getLong(1).toDouble
    info(s"KMV est=$est exact=$exact err=${math.abs(est - exact) / exact}")
    assert(math.abs(est - exact) / exact <= 0.15)
  }

  test("KMV on fewer-than-k distincts is exact") {
    val kmv = udaf(new KmvDistinct(256))
    val n = Tables.nation(spark, sf("sf0.01"))
      .agg(kmv(xxhash64(col("n_nationkey")))).collect()(0).getLong(0)
    assert(n == 25L)
  }

  test("salted two-stage aggregation == direct aggregation") {
    val ev = Tables.events(spark, sf("sf0.001"))
      .withColumn("v", col("value").cast("decimal(18,6)"))
    val salted = Salted.sumByKey(ev, "user_id", col("v"), buckets = 8)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2)))
    val direct = ev.groupBy("user_id")
      .agg(sum(col("v")).as("sum_value"), count(lit(1)).as("n"))
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }
}
