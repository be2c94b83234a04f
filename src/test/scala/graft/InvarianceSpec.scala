package graft

import org.apache.spark.sql.DataFrame

/** Continuous partition-count invariance guard (r8): the full 104-query
  * sweep lives in `graft.Invariance` (INVARIANCE_r08.json, 104/104 at
  * 32 vs 7 partitions); this spec keeps the property under `sbt test` (suite session: 4 partitions vs 7)
  * for the queries whose shapes are most tempted to depend on layout —
  * iterative contraction, window tie-breaks, the LCG corpus shuffle,
  * mergeable sketches, salting — so a regression fails CI, not a
  * cluster. Fingerprints are order-independent (sum of per-row hashes):
  * partition count can legally reorder equal sort keys, content
  * equality is the contract. */
class InvarianceSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  /** The layout-tempted representatives, one per risk family. */
  private val keys = Seq(
    "llm_dedup_clusters",   // recursive partition contraction CC
    "llm_cluster_best",     // CC + window argmax with tie-break
    "llm_corpus_shuffle",   // LCG permutation + shard assignment
    "window_topk_per_group", // rank window tie-breaks
    "agg_salted_hotkey",    // two-phase salted aggregate
    "agg_distinct_approx",  // HLL sketch merge
    "agg_quantiles_approx", // GK sketch merge
    "agg_count_min",        // Count-Min row merge
    "llm_minhash_lsh",      // banded LSH candidate generation
    "llm_ngram_jaccard",    // gram-df window cap + inverted-index join
    "llm_line_dedup")       // hash-window survivor election + collect_list reassembly

  private def fingerprint(df: DataFrame): (String, Long) = {
    val r = df.toJSON
      .selectExpr("cast(xxhash64(value) as decimal(38,0)) AS h")
      .selectExpr("sum(h) AS s", "count(*) AS n").head()
    (if (r.isNullAt(0)) "0" else r.getDecimal(0).toPlainString, r.getLong(1))
  }

  test("layout-tempted queries are partition-count invariant (session default vs 7)") {
    val confKey = "spark.sql.shuffle.partitions"
    val orig = spark.conf.get(confKey)
    def at(parts: String, fn: (org.apache.spark.sql.SparkSession, String) => DataFrame) = {
      spark.conf.set(confKey, parts)
      try graft.ops.Q.withCached(fn(spark, dir))(fingerprint)
      finally { spark.conf.set(confKey, orig); spark.catalog.clearCache() }
    }
    keys.foreach { k =>
      val fn = SparkEntry.queries(k)
      val a = at(orig, fn)
      val b = at("7", fn)
      assert(a == b, s"$k: x$orig=$a differs from x7=$b")
      assert(a._2 > 0, s"$k produced no rows — vacuous invariance")
    }
  }
}
