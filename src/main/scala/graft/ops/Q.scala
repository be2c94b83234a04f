package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: the Spark build and (when SQL-expressible)
  * its semantically-identical DuckDB oracle over the same parquet tables.
  * Keeping the pair adjacent is the main defense against name/alias drift —
  * the driver sorts result columns by name before hashing, so every output
  * column must carry the same alias in both surfaces. */
final case class Q(
    key: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(key: String, oracle: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(key, build, Some(oracle))
  def noOracle(key: String)(build: (SparkSession, String) => DataFrame): Q =
    Q(key, build, None)
}
