package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helper: two-stage ("salted") aggregation. Stage 1
  * aggregates on (key, salt) — a hot key's rows spread across
  * `buckets` reducers instead of hammering one — stage 2 combines the
  * partials on the key alone, moving only `buckets` rows per hot key.
  * Use for algebraic aggregates (sum/count/min/max) when a key holds a
  * disproportionate share of the data and AQE's skew handling doesn't
  * apply (it only splits join partitions, not aggregation keys). */
object Salted {

  def sumByKey(df: DataFrame, keyCol: String, valueCol: Column,
      buckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("sum_value"), sum(col("__pcnt")).as("n"))
}
