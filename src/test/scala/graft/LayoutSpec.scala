package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Physical-layout proofs for ops/Layout.scala — the claims the oracle
  * hash can't see:
  *  - the bucketed co-located join feeds its sort-merge join directly
  *    from the bucketed scans, with ZERO shuffle under the join (the
  *    whole point of paying the bucketed write at ingest);
  *  - Z-order clustering buys file skipping on BOTH dimensions (the
  *    min/max pruning mechanism), where a linear sort serves only its
  *    leading column;
  *  - the native interleave16 expression is bit-exact vs a reference.
  */
class LayoutSpec extends SparkSpec {

  /** Collect plan nodes through AQE wrappers and finalized stages. */
  private def allNodes(root: SparkPlan): Seq[SparkPlan] =
    root.collect {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case s: QueryStageExec => allNodes(s.plan)
      case p => Seq(p)
    }.flatten

  test("bucketed co-located join: no shuffle below the sort-merge join") {
    val s = spark
    // force the join path that would otherwise shuffle: no broadcast
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Layout.joinBucketedColocated.build(s, sf("sf0.001"))
      // collect() on df ITSELF (not a derived count) so the walked
      // df.queryExecution.executedPlan is the finalized adaptive plan
      // of this very Dataset (r8 advice: count() runs its own
      // QueryExecution and finalizes nothing here)
      assert(df.collect().nonEmpty)
      val smjs = allNodes(df.queryExecution.executedPlan)
        .collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "expected the hinted sort-merge join")
      val underJoin = smjs.flatMap(j => allNodes(j))
        .collect { case e: ShuffleExchangeExec => e }
      assert(underJoin.isEmpty,
        "bucketed join must read bucket-aligned scans, found shuffle(s) " +
          s"below the join: $underJoin")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("z-order layout prunes files on BOTH dimensions; linear sort only on one") {
    val s = spark
    val dims = Tables.events(s, sf("sf0.01"))
      .select(col("user_id").as("x"),
        expr("(unix_timestamp(date_trunc('hour', ts)) div 3600) - 473352").as("y"))
    val nFiles = 16
    // "files" = contiguous range partitions of the sort key — exactly
    // what a sorted write produces; per-file min/max footers become
    // per-partition min/max here. Returns (min_x, max_x, min_y, max_y)
    // per file.
    def fileBounds(withKey: org.apache.spark.sql.DataFrame): Array[(Long, Long, Long, Long)] =
      withKey.repartitionByRange(nFiles, col("zkey"))
        .select(col("x"), col("y"), expr("spark_partition_id()").as("pid"))
        .groupBy("pid")
        .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
          r.getAs[Long]("y0"), r.getAs[Long]("y1")))
    // mean fraction of files whose [min,max] interval on the dimension
    // contains a probe point — the fraction a min/max-pruning scan must
    // READ for an equality/short-range predicate on that dimension.
    def readFrac(bounds: Array[(Long, Long, Long, Long)],
        probes: Seq[Long], dim: Char): Double = {
      val hit = probes.map { v =>
        bounds.count { case (x0, x1, y0, y1) =>
          if (dim == 'x') x0 <= v && v <= x1 else y0 <= v && v <= y1
        }.toDouble / bounds.length
      }
      hit.sum / hit.size
    }
    val xProbes = (0L to 140L by 20L).toSeq
    val yProbes = (0L to 700L by 100L).toSeq
    val z = fileBounds(Layout.zorderKey(dims, col("x"), col("y")))
    val lin = fileBounds(dims.withColumn("zkey", col("y")))
    val (zx, zy) = (readFrac(z, xProbes, 'x'), readFrac(z, yProbes, 'y'))
    val (lx, ly) = (readFrac(lin, xProbes, 'x'), readFrac(lin, yProbes, 'y'))
    // linear-on-y: every file spans the whole x range → x predicates
    // read everything; z-order: both dimensions prune.
    assert(lx > 0.9, s"linear sort unexpectedly pruned x: $lx")
    assert(zx < 0.6, s"z-order should prune on x, read fraction $zx")
    assert(zy < 0.6, s"z-order should prune on y, read fraction $zy")
    assert(zx + zy < lx + ly,
      s"z-order combined read fraction ${zx + zy} not below linear ${lx + ly}")
  }

  test("compaction collapses the small-file layout into balanced target-size files") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    val frag = s"$root/frag"
    val comp = s"$root/comp"
    Tables.events(s, sf("sf0.01")).repartition(64)
      .write.mode("overwrite").parquet(frag)
    def files(dir: String): Array[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .listStatus(p).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    val fragFiles = files(frag)
    assert(fragFiles.length == 64)
    val total = fragFiles.map(_.getLen).sum
    val n = graft.ops.Layout.compactParquet(s, frag, comp, targetBytes = total / 4)
    val compFiles = files(comp)
    assert(compFiles.length == n)
    assert(n <= 8, s"expected <= 8 compacted files, got $n") // ~4 plus rounding
    assert(n < fragFiles.length / 4)
    // balanced: no output file more than 3x another (round-robin shuffle)
    val sizes = compFiles.map(_.getLen)
    assert(sizes.max <= 3 * sizes.min,
      s"unbalanced compaction: ${sizes.mkString(",")}")
    // content preserved exactly (decimal sum: long would ANSI-overflow)
    def digest(dir: String): String = s.read.parquet(dir)
      .selectExpr("sum(cast(xxhash64(event_id, user_id, value) as decimal(38,0)))")
      .head().getDecimal(0).toPlainString
    assert(digest(frag) == digest(comp))
  }

  test("z-order compaction re-establishes clustering; round-robin destroys it") {
    val s = spark
    val root = java.nio.file.Files.createTempDirectory("graft_compactz_spec").toString
    val frag = s"$root/frag"
    val rr = s"$root/rr"
    val zc = s"$root/zc"
    // the ingest-history pathology, with the two layout dimensions kept
    // as columns so per-FILE min/max bounds are measurable on the output
    Tables.events(s, sf("sf0.01"))
      .select(col("event_id"), col("user_id").as("x"),
        expr("(unix_timestamp(date_trunc('hour', ts)) div 3600) - 473352").as("y"))
      .repartition(64).write.mode("overwrite").parquet(frag)
    def files(dir: String) = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration)
        .listStatus(p).filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    val total = files(frag).map(_.getLen).sum
    val target = math.max(1L, total / 16)
    graft.ops.Layout.compactParquet(s, frag, rr, target)
    val nz = graft.ops.Layout.compactParquetZorder(s, frag, zc, target, "x", "y")
    // per-file min/max bounds of the ACTUAL written files — what a
    // footer-pruning scan reads
    def bounds(dir: String): Array[(Long, Long, Long, Long)] =
      s.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .collect()
        .map(r => (r.getAs[Long]("x0"), r.getAs[Long]("x1"),
          r.getAs[Long]("y0"), r.getAs[Long]("y1")))
    def readFrac(b: Array[(Long, Long, Long, Long)],
        probes: Seq[Long], dim: Char): Double =
      probes.map { v =>
        b.count { case (x0, x1, y0, y1) =>
          if (dim == 'x') x0 <= v && v <= x1 else y0 <= v && v <= y1
        }.toDouble / b.length
      }.sum / probes.size
    val xProbes = (0L to 140L by 20L).toSeq
    val yProbes = (0L to 700L by 100L).toSeq
    val zb = bounds(zc)
    val rb = bounds(rr)
    val (zx, zy) = (readFrac(zb, xProbes, 'x'), readFrac(zb, yProbes, 'y'))
    val (rx, ry) = (readFrac(rb, xProbes, 'x'), readFrac(rb, yProbes, 'y'))
    info(f"z-order compacted ($nz files): read-frac x=$zx%.2f y=$zy%.2f; " +
      f"round-robin: x=$rx%.2f y=$ry%.2f")
    // round-robin compaction: every file spans everything — no pruning
    assert(rx > 0.9 && ry > 0.9, s"round-robin unexpectedly pruned: $rx/$ry")
    // sort-aware compaction holds the pre-compaction Z-order pruning
    // levels (the fractions the layout_zorder test pins at < 0.6)
    assert(zx < 0.6, s"z-compacted copy should prune on x, read fraction $zx")
    assert(zy < 0.6, s"z-compacted copy should prune on y, read fraction $zy")
    // content preserved bit-for-bit through the sort-aware rewrite
    def digest(dir: String): String = s.read.parquet(dir)
      .selectExpr("sum(cast(xxhash64(event_id, x, y) as decimal(38,0)))")
      .head().getDecimal(0).toPlainString
    assert(digest(frag) == digest(zc))
  }

  test("interleave16 matches a reference bit-by-bit implementation") {
    val s = spark
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    def ref(x: Long, y: Long): Long = {
      var r = 0L
      var b = 0
      while (b < 16) {
        r |= ((x >> b) & 1L) << (2 * b)
        r |= ((y >> b) & 1L) << (2 * b + 1)
        b += 1
      }
      r
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (65536L, 1L), (-1L, 7L))
    val got = cases.toDF("x", "y")
      .select(expr("interleave16(x, y)")).as[Long].collect()
    val want = cases.map { case (x, y) => ref(x & 0xFFFFL, y & 0xFFFFL) }
    assert(got.toSeq == want)
  }
}
