package graft

import org.apache.spark.sql.functions._

/** Properties of the PQ ANN family (ops/AnnPq.scala): recall floor of
  * the two-phase ADC+rerank search vs unsampled brute force, the
  * artifact lifecycle (reload ≡ in-session, encode-only append,
  * rewrite-delete), and the compact-code shape the 100 TB memory
  * argument rests on. Runs at sf0.01 (500 vectors) so the
  * rerankDepth=100 rerank is a genuine 20% selection, not a near-full
  * scan. */
class AnnPqSpec extends SparkSpec {

  private val dir = sf("sf0.01")

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  private def triples(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("ann PQ: registered row clears the recall floor vs unsampled brute force") {
    val exact = pairs(graft.ops.Llm.bruteForceTopk(
      graft.ops.Llm.scaledEmb(spark, dir), lit(true)))
    val pq = pairs(SparkEntry.queries("llm_ann_pq")(spark, dir))
    val recall = (pq intersect exact).size.toDouble / exact.size
    info(s"ann PQ recall@5 = $recall")
    assert(recall >= 0.85, s"recall $recall below floor")
  }

  test("ann PQ codes are the compact shape the memory argument claims") {
    val idx = graft.ops.AnnPq.buildAnnPqIndex(
      graft.ops.Llm.scaledEmb(spark, dir))
    try {
      val bad = idx.codes.where(
        expr("size(codes) != 8 or exists(codes, c -> c < 0 or c >= 32)"))
      assert(bad.count() == 0, "every vector must encode to 8 codes in [0,32)")
      // k-means cells that empty during refinement die (standard); the
      // codebook stays within one or two of full
      val ncells = idx.codebooks.count()
      assert(ncells <= 8 * 32 && ncells >= 8 * 24,
        s"codebook collapsed: $ncells cells of ${8 * 32}")
      // every codebook centroid has the subspace width (64/8 = 8)
      assert(idx.codebooks.where(expr("size(ce) != 8")).count() == 0)
    } finally idx.unpersist()
  }

  test("ann PQ index API: reload == in-session, encode-only append, recall floor") {
    val emb = graft.ops.Llm.scaledEmb(spark, dir)
    val base = emb.where(col("vec_id") % 10 =!= 0)
    val incoming = emb.where(col("vec_id") % 10 === 0)
    val queries = emb.where(col("vec_id") < 10)
    val idx = graft.ops.AnnPq.buildAnnPqIndex(base)
    val inSession = triples(graft.ops.AnnPq.pqQueryTopk(idx, queries))
    val tmp = java.nio.file.Files.createTempDirectory("pq_idx_").toString
    try {
      idx.write(tmp)
      val loaded = graft.ops.AnnPq.AnnPqIndex.load(spark, tmp)
      assert(triples(graft.ops.AnnPq.pqQueryTopk(loaded, queries)) == inSession)
      assert(loaded.trainedRows == idx.trainedRows)
      val appended = graft.ops.AnnPq.appendToPqIndex(loaded, incoming)
      assert(appended.codes.count() == emb.count())
      assert(appended.vecs.count() == emb.count())
      // codebooks untouched by append (frozen-quantizer contract)
      val cbOf = (ix: graft.ops.AnnPq.AnnPqIndex) => ix.codebooks.collect()
        .map(r => (r.getAs[Int]("sub_id"), r.getAs[Int]("code")) -> r.getSeq[Long](2)).toMap
      assert(cbOf(appended) == cbOf(idx))
      // appended vectors genuinely searchable at the floor
      val exact = pairs(graft.ops.Llm.bruteForceTopk(emb, lit(true)))
      val ann = pairs(graft.ops.AnnPq.pqQueryTopk(appended, queries))
      val recall = (ann intersect exact).size.toDouble / exact.size
      info(s"appended-PQ-index recall@5 = $recall")
      assert(recall >= 0.85, s"recall $recall below floor after append")
      // append didn't bump trainedRows: the drift denominator grows
      assert(appended.trainedRows == idx.trainedRows)
      assert(appended.appendedFraction > 0.0)
      loaded.unpersist()
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("ann IVFPQ: composed coarse-probe + list-restricted ADC clears the floor") {
    val exact = pairs(graft.ops.Llm.bruteForceTopk(
      graft.ops.Llm.scaledEmb(spark, dir), lit(true)))
    val ivfpq = pairs(SparkEntry.queries("llm_ann_ivfpq")(spark, dir))
    val recall = (ivfpq intersect exact).size.toDouble / exact.size
    info(s"ann IVFPQ recall@5 = $recall")
    assert(recall >= 0.8, s"recall $recall below floor")
  }

  test("ann IVFPQ index API: reload == in-session, encode-only append, delete") {
    val emb = graft.ops.Llm.scaledEmb(spark, dir)
    val base = emb.where(col("vec_id") % 10 =!= 0)
    val incoming = emb.where(col("vec_id") % 10 === 0)
    val queries = emb.where(col("vec_id") < 10)
    val idx = graft.ops.AnnPq.buildAnnIvfPqIndex(base)
    val inSession = triples(graft.ops.AnnPq.ivfPqQueryTopk(idx, queries))
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_idx_").toString
    try {
      idx.write(tmp)
      val loaded = graft.ops.AnnPq.AnnIvfPqIndex.load(spark, tmp)
      assert(triples(graft.ops.AnnPq.ivfPqQueryTopk(loaded, queries)) == inSession)
      val appended = graft.ops.AnnPq.appendToIvfPqIndex(loaded, incoming)
      assert(appended.codes.count() == emb.count())
      // both quantizers untouched by append
      assert(appended.centroids.collect().toSet == idx.centroids.collect().toSet)
      assert(appended.codebooks.collect().toSet == idx.codebooks.collect().toSet)
      assert(appended.trainedRows == idx.trainedRows)
      // deleted ids can neither pre-rank nor rerank
      val del = graft.ops.AnnPq.deleteFromIvfPqIndex(appended,
        emb.where(col("vec_id") % 7 === 0).select("vec_id"))
      val res = pairs(graft.ops.AnnPq.ivfPqQueryTopk(del,
        emb.where(col("vec_id") < 10 && col("vec_id") % 7 =!= 0)))
      assert(res.forall(_._2 % 7 != 0), "a deleted vector came back as a neighbor")
      loaded.unpersist()
    } finally {
      idx.unpersist()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("ann PQ deletion: deleted ids absent from results, survivors at the floor") {
    val emb = graft.ops.Llm.scaledEmb(spark, dir)
    val removedPred = col("vec_id") % 7 === 0
    val removed = emb.where(removedPred).select("vec_id")
    val remaining = emb.where(!removedPred)
    val queries = emb.where(col("vec_id") < 10 && !removedPred)
    val idx = graft.ops.AnnPq.buildAnnPqIndex(emb)
    try {
      val del = graft.ops.AnnPq.deleteFromPqIndex(idx, removed)
      val res = pairs(graft.ops.AnnPq.pqQueryTopk(del, queries))
      assert(res.forall(_._2 % 7 != 0), "a deleted vector came back as a neighbor")
      val exact = pairs(graft.ops.Llm.bruteForceTopk(remaining, lit(true)))
      val recall = (res intersect exact).size.toDouble / exact.size
      info(s"post-delete PQ recall@5 = $recall")
      assert(recall >= 0.85, s"recall $recall below floor after delete")
      // conservative trainedRows charge — drift trigger can't arrive late
      assert(del.trainedRows <= idx.trainedRows)
    } finally idx.unpersist()
  }

  test("TopKScored: bounded-heap top-k == sort-based reference, any k") {
    // deterministic LCG candidates: 40 groups x 200 candidates with
    // heavy score ties (score = h % 17) so the id tie-break is exercised
    val rows = for (g <- 0L until 40L; i <- 0L until 200L) yield {
      val h = (g * 200 + i) * 6364136223846793005L + 1442695040888963407L
      (g, ((h >>> 33) % 17).toDouble, i)
    }
    import spark.implicits._
    val df = spark.createDataset(rows).toDF("g", "score", "id")
      .repartition(7) // arrival order != rank order
    for (k <- Seq(1, 5, 100, 500)) {
      val got = graft.functions.TopKScored.rankedTopk(
          df, "g", col("score"), col("id"), k, idName = "id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = rows.groupBy(_._1).flatMap { case (g, cs) =>
        cs.sortBy(c => (-c._2, c._3)).take(k).zipWithIndex
          .map { case (c, i) => (g, c._3, (i + 1).toLong) }
      }.toSet
      assert(got == want, s"k=$k mismatch")
    }
  }

  test("PQ search plan has no per-query sort (no WindowExec anywhere)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def allNodes(p: SparkPlan): Seq[SparkPlan] = (p +: p.children.flatMap(allNodes)).flatMap {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case s: QueryStageExec => allNodes(s.plan)
      case n => Seq(n)
    }
    val emb = graft.ops.Llm.scaledEmb(spark, dir)
    val idx = graft.ops.AnnPq.buildAnnPqIndex(emb)
    try {
      val res = graft.ops.AnnPq.pqQueryTopk(idx, emb.where(col("vec_id") < 10))
      assert(res.collect().nonEmpty) // finalize the adaptive plan
      val wins = allNodes(res.queryExecution.executedPlan)
        .collect { case w: WindowExec => w }
      assert(wins.isEmpty,
        s"pre-rank/rerank must be bounded-heap aggregates, found windows: $wins")
    } finally idx.unpersist()
  }
}
