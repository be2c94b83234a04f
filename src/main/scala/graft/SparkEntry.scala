package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 (the operator inventory)
  * and §7 (build plan). Each registered Q carries its Spark build and its
  * DuckDB oracle twin; the driver hash-compares the two at sf0.01. */
object SparkEntry {

  /** Every implemented operator, one Q per SURVEY §2 row. Duplicate
    * keys would silently shadow a query in the toMap below — shrinking
    * the correctness gate with everything still green (r4 review) — so
    * the registry fails fast instead. lazy val: Bench resolves queries
    * inside its timed window, and rebuilding 12 module Seqs per lookup
    * was measured noise. */
  lazy val registry: Seq[Q] = {
    val qs = Scans.all ++ Funcs.all ++ Joins.all ++ Aggs.all ++ Windows.all ++
      SetSort.all ++ Generators.all ++ StreamTwins.all ++ Llm.all ++
      TextOps.all ++ DedupOps.all ++ MediaOps.all ++ AnnPq.all ++ Rewrite.all ++
      Layout.all ++ Graph.all ++ Behavior.all ++ GraftCatalog.all ++ Bpe.all
    val dups = qs.groupBy(_.key).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query keys would shadow queries: ${dups.mkString(", ")}")
    qs
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("agg_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.key -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.key -> _)).toMap
}
