package graft

import org.apache.spark.sql.functions._

/** The r5 library-level cache lifecycle (r4 verdict item 6): every
  * query build releases its own Q.cached intermediates when driven
  * through Q.withCached — a user embedding graft in a long-lived
  * session must not inherit unbounded cache accretion (r4 counted 24
  * persists / 1 unpersist across src/main; only the Bench/Verify
  * harnesses cleaned up, via clearCache). */
class CacheLifecycleSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  /** CacheManager.isEmpty via reflection: sharedState/cacheManager are
    * private[sql] in Scala but public in bytecode, and there is no
    * public "is the cache empty" API. */
  private def cacheIsEmpty: Boolean = {
    val ss = spark.getClass.getMethod("sharedState").invoke(spark)
    val cm = ss.getClass.getMethod("cacheManager").invoke(ss)
    cm.getClass.getMethod("isEmpty").invoke(cm).asInstanceOf[Boolean]
  }

  test("withCached releases every cached intermediate of a single query") {
    // start clean — earlier suites sharing the session may have cached
    spark.catalog.clearCache()
    assert(cacheIsEmpty)
    // the heaviest cache users: LSH index builds, contraction tags,
    // scaled-embedding frames, the composed pipeline
    for (name <- Seq("llm_minhash_lsh", "llm_dedup_clusters",
        "llm_corpus_clean", "llm_ann_ivf", "llm_bloom_decontaminate",
        "generate_resample", "graph_pagerank", "ts_interpolate")) {
      val n = graft.ops.Q.withCached(
        SparkEntry.queries(name)(spark, dir))(_.count())
      assert(n > 0, s"$name returned no rows")
      assert(cacheIsEmpty,
        s"$name left cached entries behind after withCached")
    }
  }

  test("withCached releases on action failure too") {
    spark.catalog.clearCache()
    intercept[RuntimeException] {
      graft.ops.Q.withCached(
        SparkEntry.queries("llm_minhash_lsh")(spark, dir)) { _ =>
        throw new RuntimeException("boom")
      }
    }
    assert(cacheIsEmpty, "a failed action must still release the build's caches")
  }

  test("index query/append paths cache nothing of their own outside a scope (r8)") {
    // r7 advice: lshQueryTopk cached its one-shot query signatures, so
    // the advertised cross-job pattern — load a persisted index, query
    // it repeatedly in a long-lived session, no withCached scope —
    // leaked one unreleasable persist PER CALL. The fix computes
    // one-shot signatures uncached; after releasing the index's own
    // frames the cache must be empty again, however many queries and
    // appends ran.
    spark.catalog.clearCache()
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.ops.Llm.scaledEmb(spark, dir)
    val idx = graft.ops.Llm.buildAnnLshIndex(emb.where(col("vec_id") % 10 =!= 0))
    var appended = idx
    (1 to 3).foreach { _ =>
      graft.ops.Llm.lshQueryTopk(appended, emb.where(col("vec_id") < 5)).count()
      appended = graft.ops.Llm.appendToLshIndex(appended,
        emb.where(col("vec_id") % 10 === 0).limit(10))
    }
    // release the caller-owned index persists (build + the appends all
    // share/union the same two cached frames lineage-wise: only the
    // build's two and nothing else should be cached)
    idx.unpersist()
    assert(cacheIsEmpty,
      "query/append calls must not accrete their own cached frames")
  }

  test("cached() outside any scope degrades to a plain persist") {
    spark.catalog.clearCache()
    // builds run WITHOUT withCached keep their pre-r5 behavior: the
    // intermediates stay cached for the caller to reuse/clear
    val df = SparkEntry.queries("llm_minhash_lsh")(spark, dir)
    df.count()
    assert(!cacheIsEmpty, "un-scoped builds should still persist their indexes")
    spark.catalog.clearCache()
    assert(cacheIsEmpty)
  }
}
