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

  /** Deterministic per-row salt: hash of ALL columns, NOT
    * partition-id/monotonic-id — those change on stage retry, and a
    * fetch-failure recompute that re-salts rows can double-count or
    * drop them once some reducers have already committed (the
    * SPARK-23207 failure class).
    *
    * PRECONDITION: rows of a hot key must differ in at least one
    * column. Byte-identical duplicate rows all hash to ONE salt — for
    * them the spreading is not "marginally reduced" but zero, because
    * identical rows carry no bits to disambiguate deterministically
    * (any disambiguator that splits them is recompute-order-dependent
    * and reintroduces the retry bug). Fact tables with a line/sequence
    * number (lineitem's l_linenumber — both current call sites) satisfy
    * this; a corpus of identical rows should be pre-aggregated to
    * (row, count) first, which is also the cheaper plan. */
  private def rowSalt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets))

  /** Fail fast instead of silently clobbering a caller's own `__salt`
    * column (withColumn would replace it and drop would erase it from
    * the result — data corruption, not an error; r4 advice). */
  private def requireNoSalt(df: DataFrame, who: String): Unit =
    require(!df.columns.contains("__salt"),
      s"$who: input already has a '__salt' column; rename it first " +
        "(the helper would silently overwrite and then drop it)")

  def sumByKey(df: DataFrame, keyCol: String, valueCol: Column,
      buckets: Int = 16): DataFrame = {
    requireNoSalt(df, "Salted.sumByKey")
    df.withColumn("__salt", rowSalt(df, buckets))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }

  /** Skew-mitigation for JOINS: salt the big (skewed) side into
    * `buckets` sub-keys and replicate the small side once per bucket,
    * so a hot join key's rows land on `buckets` reducers instead of
    * one. The manual counterpart to AQE's skew-join split for when the
    * skew is known ahead of time (or the small side is just beyond the
    * broadcast threshold, where AQE's OptimizeSkewedJoin doesn't
    * engage because the join never shuffles the small side). Salting
    * must be invisible in the result — callers oracle-check against
    * the plain join. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, buckets: Int = 8): DataFrame = {
    requireNoSalt(big, "Salted.saltedEquiJoin(big)")
    requireNoSalt(small, "Salted.saltedEquiJoin(small)")
    val saltedBig = big.withColumn("__salt", rowSalt(big, buckets))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicated,
      saltedBig(bigKey) === replicated(smallKey)
        && saltedBig("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
