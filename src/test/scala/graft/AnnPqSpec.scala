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

  test("assignCodes: collected-codebook path == window fallback above the " +
      "size bound (r15)") {
    // same ceiling as Llm.nearestLists: force the pre-r14 join + window
    // form with a 1-byte bound and pin that the whole deterministic
    // build — codebooks and encoded codes — is identical
    val emb = graft.ops.Llm.scaledEmb(spark, dir)
    def codes() = graft.ops.AnnPq.buildAnnPqIndex(emb).codes
      .select(col("vec_id"), expr("cast(codes as string)").as("cs"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val arrayPath = codes()
    spark.conf.set("spark.graft.ann.maxCollectedCodebookBytes", "1")
    val windowPath = try codes()
    finally spark.conf.unset("spark.graft.ann.maxCollectedCodebookBytes")
    assert(arrayPath == windowPath)
    assert(arrayPath.nonEmpty)
  }

  test("ann PQ/IVFPQ: sampled-trainer builds clear the floor (the 100 TB claim)") {
    // "at 100 TB the refinements run on a sample" — measured, not
    // asserted: quantizers trained on a ~4x subsample (trainSample=128
    // of 500), encode/search over everything, recall floor holds.
    val emb = graft.ops.Llm.scaledEmb(spark, dir)
    val exact = pairs(graft.ops.Llm.bruteForceTopk(emb, lit(true)))
    val q = graft.ops.Llm.scaledEmb(spark, dir).where(col("vec_id") < 10)
    graft.ops.Q.withCached {
      val idx = graft.ops.AnnPq.buildAnnPqIndex(emb, trainSample = 128)
      graft.ops.AnnPq.pqQueryTopk(idx, q)
    } { df =>
      val recall = (pairs(df) intersect exact).size.toDouble / exact.size
      info(s"sampled-trainer PQ recall@5 = $recall")
      assert(recall >= 0.8, s"sampled-trainer PQ recall $recall below floor")
    }
    graft.ops.Q.withCached {
      val idx = graft.ops.AnnPq.buildAnnIvfPqIndex(emb, trainSample = 128)
      graft.ops.AnnPq.ivfPqQueryTopk(idx, q)
    } { df =>
      val recall = (pairs(df) intersect exact).size.toDouble / exact.size
      info(s"sampled-trainer IVFPQ recall@5 = $recall")
      assert(recall >= 0.7, s"sampled-trainer IVFPQ recall $recall below floor")
    }
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

  test("PQ + IVFPQ maintenance: frozen-codebook drift decay, maybeRetrain restores (r9)") {
    // r8 verdict item 6: the IVF append-decay curve calibrated
    // maybeRetrain's 0.5 threshold; measure the same drift-append
    // ladder for the PQ families, where the decay mechanism is frozen
    // CODEBOOKS mis-encoding a shifted region (ADC pre-rank quality
    // collapses, and a small rerankDepth can't rescue what pre-rank
    // never surfaced). Same synthetic drift corpus as the IVF curve:
    // 10 tight base clusters train the quantizers; three appended
    // shards bring wide clusters from a region they never saw.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    def h(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def vec(seed: Long, scale: Long, offset: Long): Array[Long] =
      (0 until 64).map(d => math.floorMod(h(seed * 64 + d), 2 * scale + 1) - scale + offset).toArray
    def cluster(k: Int, offset: Long, jitter: Long): Seq[(Long, Array[Long])] = {
      val c = vec(1000 + k, 1000, offset)
      (0 until 20).map { j =>
        val m = vec(k * 100 + j, jitter, 0).zip(c).map { case (a, b) => a + b }
        (10000L + k * 100 + j, m)
      }
    }
    def frame(rows: Seq[(Long, Array[Long])]) =
      rows.toDF("vec_id", "e")
        .withColumn("n2", expr("dot_long(e, e)"))
        .select(col("vec_id"), col("e"), col("n2"))
    val baseRows = (0 until 10).flatMap(cluster(_, 0, 200))
    val shardRows = (0 until 3).map { s =>
      (10 + s * 5 until 15 + s * 5).flatMap(cluster(_, 2500, 700))
    }
    def exactTop(corpus: Seq[(Long, Array[Long])], qs: Seq[(Long, Array[Long])]): Set[(Long, Long)] = {
      def dot(a: Array[Long], b: Array[Long]): Double =
        a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      qs.flatMap { case (qid, qv) =>
        corpus.filter(_._1 != qid)
          .map { case (cid, cv) => (cid, dot(qv, cv) / (math.sqrt(dot(qv, qv)) * math.sqrt(dot(cv, cv)))) }
          .sortBy { case (cid, sc) => (-sc, cid) }.take(10).map(c => (qid, c._1))
      }.toSet
    }
    def queriesOf(shardIdx: Int): Seq[(Long, Array[Long])] =
      (0 until 3).take(shardIdx + 1).flatMap(s => shardRows(s).grouped(20).map(_.head))

    // --- flat PQ ladder (rerankDepth 20: the ADC quality is the test) ---
    var pq = graft.ops.AnnPq.buildAnnPqIndex(frame(baseRows))
    var corpus = baseRows
    var pqStale = 0.0
    (0 until 3).foreach { s =>
      pq = graft.ops.AnnPq.appendToPqIndex(pq, frame(shardRows(s)))
      corpus = corpus ++ shardRows(s)
      val qs = queriesOf(s)
      val got = graft.ops.AnnPq.pqQueryTopk(pq, frame(qs), k = 10, rerankDepth = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = exactTop(corpus, qs)
      pqStale = (got intersect exact).size.toDouble / exact.size
      info(f"PQ after shard ${s + 1}: appendedFraction ${pq.appendedFraction}%.2f recall@10 $pqStale%.3f")
    }
    assert(pq.appendedFraction > 0.5)
    // below the threshold: no-op (same object)
    val pqSmall = graft.ops.AnnPq.appendToPqIndex(
      graft.ops.AnnPq.buildAnnPqIndex(frame(baseRows)), frame(shardRows(0)))
    assert(graft.ops.AnnPq.maybeRetrainPq(pqSmall) eq pqSmall)
    // past it: retrain fires and fresh codebooks restore the loss
    val pqRe = graft.ops.AnnPq.maybeRetrainPq(pq)
    assert(!(pqRe eq pq) && pqRe.appendedFraction == 0.0)
    val qsF = queriesOf(2)
    val exactF = exactTop(corpus, qsF)
    val gotRe = graft.ops.AnnPq.pqQueryTopk(pqRe, frame(qsF), k = 10, rerankDepth = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqFresh = (gotRe intersect exactF).size.toDouble / exactF.size
    info(f"PQ retrained: recall@10 $pqFresh%.3f (stale was $pqStale%.3f)")
    // the drift corpus is deliberately hostile (wide shifted clusters vs
    // a ±3200-range 8x32 codebook at depth 20), so the pin is the
    // RESTORE MARGIN, not an absolute floor: fresh codebooks must win
    // clearly (measured 0.313 vs 0.093 stale — deterministic fixture)
    assert(pqFresh >= pqStale + 0.1,
      f"retrained codebooks must clearly beat frozen: $pqFresh%.3f vs $pqStale%.3f")

    // --- IVFADC ladder (both quantizers frozen: nprobe=2, depth 20) ---
    var ivfpq = graft.ops.AnnPq.buildAnnIvfPqIndex(frame(baseRows))
    var ipStale = 0.0
    (0 until 3).foreach { s =>
      ivfpq = graft.ops.AnnPq.appendToIvfPqIndex(ivfpq, frame(shardRows(s)))
      val qs = queriesOf(s)
      val got = graft.ops.AnnPq.ivfPqQueryTopk(ivfpq, frame(qs), k = 10,
          nprobe = 2, rerankDepth = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = exactTop(baseRows ++ (0 to s).flatMap(shardRows), qs)
      ipStale = (got intersect exact).size.toDouble / exact.size
      info(f"IVFPQ after shard ${s + 1}: appendedFraction ${ivfpq.appendedFraction}%.2f recall@10 $ipStale%.3f")
    }
    assert(ivfpq.appendedFraction > 0.5)
    val ipSmall = graft.ops.AnnPq.appendToIvfPqIndex(
      graft.ops.AnnPq.buildAnnIvfPqIndex(frame(baseRows)), frame(shardRows(0)))
    assert(graft.ops.AnnPq.maybeRetrainIvfPq(ipSmall) eq ipSmall)
    val ipRe = graft.ops.AnnPq.maybeRetrainIvfPq(ivfpq)
    assert(!(ipRe eq ivfpq) && ipRe.appendedFraction == 0.0)
    val gotIpRe = graft.ops.AnnPq.ivfPqQueryTopk(ipRe, frame(qsF), k = 10,
        nprobe = 2, rerankDepth = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ipFresh = (gotIpRe intersect exactF).size.toDouble / exactF.size
    info(f"IVFPQ retrained: recall@10 $ipFresh%.3f (stale was $ipStale%.3f)")
    assert(ipFresh >= ipStale,
      f"retrained quantizers must not be worse: $ipFresh%.3f < $ipStale%.3f")
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
