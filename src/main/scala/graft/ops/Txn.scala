package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal transactional table commits (r8 verdict item 3): the repo's
  * rewrite operators (MERGE, compaction, corpus rewrites) compute new
  * table VERSIONS, but a plain `mode("overwrite").parquet(dir)` is not
  * atomic — a reader racing a half-finished overwrite, or any crash
  * mid-write, sees a torn table. With the Delta/Iceberg jars absent
  * from this environment, the fix is the protocol those formats rest
  * on, reduced to its core: IMMUTABLE data + an ATOMIC pointer swap.
  *
  * Layout of a table at `root`:
  * {{{
  *   root/data/<uuid>/      immutable parquet snapshots (never rewritten)
  *   root/_commits/<N>      manifest: one line, the data dir of version N
  *   root/_tmp/<uuid>       manifest staging (invisible to readers)
  * }}}
  *
  * Commit protocol: (1) write the full new snapshot to a FRESH
  * `data/<uuid>` dir nobody can be reading; (2) stage a manifest file
  * naming that dir under `_tmp/`; (3) `rename(_tmp/x, _commits/N)` —
  * rename-without-overwrite is the one atomic primitive HDFS and local
  * FS both guarantee (it FAILS if `_commits/N` exists), so it is both
  * the publish and the concurrency check: a loser of a version race
  * gets a rename failure and retries at N+1 with its snapshot intact.
  * Readers resolve `max(_commits)` → data dir; every state a crash can
  * leave (orphan snapshot, staged manifest) is invisible to them, so a
  * torn table is unobservable by construction — TxnSpec kills a rewrite
  * mid-write and proves it.
  *
  * At 100 TB this is exactly how the production formats behave: commits
  * cost one rename regardless of data size, readers pin a snapshot for
  * the whole query (no in-place mutation to race), old versions remain
  * for time travel until [[vacuum]]. r9 closes the two gaps the r8
  * design carried: [[commitAppend]] gives incremental ADD-file commits
  * (a version's manifest lists many dirs; appending a shard to a
  * 100 TB table costs O(shard), and the CDC feed serves appends at
  * file level without diffing), [[commitIf]] gives serializable
  * conflict detection for rewrites, and [[commitDelete]] gives
  * O(deleted-keys) row-level deletes via tombstone entries (Delta's
  * deletion-vector role; readers fold entries in log order, and a
  * periodic compacting [[commit]] collapses the chain). The remaining
  * simplification vs Delta: tombstones are key-level, not per-file
  * row bitmaps — [[readPruned]] still skips files by stats and folds
  * the tombstone anti-joins over the pruned scan (r10), paying one
  * O(deleted-keys) join per tombstone until compaction. */
object Txn {

  private def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Per-root JVM lock serializing every publish's check-then-rename.
    *
    * On an HDFS-contract store, rename-without-overwrite is atomic and
    * FAILS on an existing destination — the rename alone is the CAS
    * and this lock is redundant (but harmless: publishes are
    * millisecond metadata ops). On LOCAL filesystems Hadoop's rename
    * is POSIX rename(2), which silently OVERWRITES an existing
    * destination, so the `exists(target)` pre-check leaves a TOCTOU
    * window: two same-JVM writers racing one version number could both
    * "succeed" with the loser's manifest overwritten — a lost commit.
    * (TxnSpec's concurrent-upsert race caught exactly this, ~1-in-5
    * runs.) Serializing check+rename per root closes the window for
    * every writer in one JVM — the Spark-driver case, where streaming
    * sinks and maintenance threads share a session. Multiple JVMs
    * writing one LOCAL-FS table remain unsupported (Delta's
    * LocalLogStore documents the identical limitation; use an
    * HDFS-contract store for multi-process writers). */
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def publishLock(root: String): Object =
    publishLocks.computeIfAbsent(root, _ => new Object)

  private def committedVersions(f: FileSystem, root: String): Seq[Long] = {
    val dir = new Path(s"$root/_commits")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(_.isFile)
      .flatMap(st => scala.util.Try(st.getPath.getName.toLong).toOption)
  }

  /** Highest committed version, if any commit ever succeeded. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] = {
    val vs = committedVersions(fs(spark, root), root)
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** Manifest format: line 1 = the data dir (the original v1 contract);
    * line 2+ = optional `key<TAB>value` commit-metadata pairs. Old
    * single-line manifests parse as metadata-free. */
  private def manifestLines(f: FileSystem, root: String, n: Long): Seq[String] = {
    val in = f.open(new Path(s"$root/_commits/$n"))
    try {
      // full drain, not one bounded read(): a single read() may legally
      // return short, and an append-chain manifest grows ~43 bytes per
      // shard — truncating either way would silently drop committed
      // dirs from the snapshot (r9 review)
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var len = in.read(chunk)
      while (len >= 0) { buf.write(chunk, 0, len); len = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8").trim.split('\n').toSeq.map(_.trim)
    } finally in.close()
  }

  private def manifestTarget(f: FileSystem, root: String, n: Long): String =
    manifestLines(f, root, n).head

  /** The snapshot dirs of version `n` — line 1 is a comma-separated
    * list since [[commitAppend]] (r9); full-snapshot commits write one
    * dir, appends extend the previous version's list, so v1 manifests
    * parse unchanged. Entries are either `data/<uuid>` (rows added) or
    * `~data/<uuid>@<keyCol>` (a [[commitDelete]] tombstone: keys in
    * that dir delete matching rows from everything BEFORE it in the
    * list). */
  private def manifestDirs(f: FileSystem, root: String, n: Long): Seq[String] =
    manifestTarget(f, root, n).split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  /** Resolve a manifest entry's dir to a readable path: entries are
    * normally ROOT-RELATIVE (`data/<uuid>`), but a [[cloneTable]]
    * manifest references the SOURCE table's dirs ABSOLUTELY (leading
    * `/` or a URI scheme) — the zero-copy clone mechanism. */
  private def resolveDir(root: String, dir: String): String =
    if (dir.startsWith("/") || dir.contains("://")) dir else s"$root/$dir"

  /** Hive partition-directory escaping (r11 advice): Spark writes
    * `col=value` subdir names URL-escaped ('a b' → 'a%20b') and null
    * values as the default-partition sentinel. Reconstruction must
    * UNESCAPE (a raw name round-trips the wrong literal for string
    * partition columns) and probes must ESCAPE (matching the raw
    * listing against an unescaped probe value silently drops the
    * partition — pruning would stop being one-sided). Delegated to
    * Spark's own codec so the rules cannot drift from the writer's. */
  private[graft] val hiveDefaultPartition = "__HIVE_DEFAULT_PARTITION__"
  private[graft] def unescapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName(s)
  private[graft] def escapePathName(s: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.escapePathName(s)

  /** The directory-name form of a partition probe value: null probes
    * match the null-sentinel subdir, everything else hive-escapes. */
  private def dirValue(x: Any): String =
    if (x == null) hiveDefaultPartition else escapePathName(x.toString)

  /** `input_file_name()` reports URI-ENCODED paths — an on-disk
    * directory literally named `src=a b` (space is NOT in Hive's escape
    * set, so Spark writes it raw) surfaces as `src=a%20b`. Sidecar
    * writers key and PLACE their files by these extracted segments, so
    * without decoding the partitioned stats/bloom sidecars landed in a
    * bogus sibling directory with keys no reader ever matches (found by
    * the r12 escape round-trip spec). One URI decode maps the reported
    * segment back to the exact on-disk name listStatus sees. */
  private def decodeUriSegment(s: String): String =
    scala.util.Try(new java.net.URI(s).getPath).toOption.getOrElse(s)

  /** [[decodeUriSegment]] per `/`-separated segment of a partition-dir
    * CHAIN (`a=1/b=x%20y` → `a=1/b=x y`, r13 multi-level): the chain
    * separator itself must not decode, only each dir name. */
  private def decodeUriChain(s: String): String =
    s.split('/').map(decodeUriSegment).mkString("/")

  /** A tombstone entry's key-column spec: single column (`~dir@a`) or
    * COMPOSITE (`~dir@a+b`, r12 — a conjunctive-equality DELETE's
    * natural key). '+' never appears in a committed key column name
    * (commitDelete validates), so the split is unambiguous and every
    * pre-r12 manifest parses unchanged. */
  private def tombstoneCols(keyCol: String): Seq[String] =
    keyCol.split('+').toSeq

  /** A parsed manifest entry: (dir, tombstone key column or None). */
  private def parseEntry(e: String): (String, Option[String]) =
    if (e.startsWith("~")) {
      val at = e.lastIndexOf('@')
      require(at > 0, s"malformed tombstone entry: $e")
      (e.substring(1, at), Some(e.substring(at + 1)))
    } else (e, None)

  private def hasTombstones(entries: Seq[String]): Boolean =
    entries.exists(_.startsWith("~"))

  private def manifestBody(dataRel: String, meta: Map[String, String]): String = {
    meta.foreach { case (k, v) =>
      require(!k.contains('\t') && !k.contains('\n') &&
        !v.contains('\t') && !v.contains('\n'),
        s"commit metadata must be tab/newline-free: $k=$v") }
    (dataRel +: meta.toSeq.sortBy(_._1).map { case (k, v) => s"$k\t$v" })
      .mkString("\n")
  }

  /** Commit log (Delta's DESCRIBE HISTORY): every committed version,
    * ascending, with its snapshot dir and the writer-supplied metadata
    * (operation name, source job, input versions — whatever the caller
    * recorded at [[commit]] time). Reading the log costs one small file
    * per version — never touches data. */
  def history(spark: SparkSession, root: String): Seq[(Long, String, Map[String, String])] = {
    val f = fs(spark, root)
    committedVersions(f, root).sorted.map { n =>
      val lines = manifestLines(f, root, n)
      val meta = lines.drop(1).flatMap { l =>
        l.split('\t') match {
          case Array(k, v) => Some(k -> v)
          case _           => None
        }
      }.toMap
      (n, lines.head, meta)
    }
  }

  /** TIMESTAMP AS OF (r10): the highest version whose manifest was
    * PUBLISHED at or before `tsMillis`. Rename preserves mtime, so
    * every winning publish explicitly RE-STAMPS the manifest's mtime
    * to the publish instant ([[stampPublish]], r11) — the staging time
    * a contended CAS loop would otherwise leak can predate visibility
    * (Delta reads its log timestamps the same way).
    * "What did the table look like when yesterday's job ran?" is
    * `readVersion(root, versionAsOf(root, ts))`. None if no RETAINED
    * commit is old enough — vacuum deletes old manifests, so a
    * timestamp older than the retention window resolves to None (the
    * snapshot is gone), never silently to a newer version. The usual
    * caveat applies: FS mtimes are the clock of
    * the filesystem, monotone per table only as far as publishes are
    * (concurrent publishes within one mtime tick tie-break by version
    * number). */
  def versionAsOf(spark: SparkSession, root: String,
      tsMillis: Long): Option[Long] = {
    val f = fs(spark, root)
    val eligible = committedVersions(f, root).filter { n =>
      f.getFileStatus(new Path(s"$root/_commits/$n"))
        .getModificationTime <= tsMillis
    }
    if (eligible.isEmpty) None else Some(eligible.max)
  }

  /** DESCRIBE DETAIL (r10): (numVersions, numDataFiles, sizeBytes,
    * numTombstoneEntries) of the CURRENT version — the operational
    * at-a-glance a compaction scheduler reads (many small files →
    * [[compactCommit]]; tombstone chain deep → compact to collapse).
    * Metadata-only: walks the manifest's dirs, never opens data. */
  def tableDetail(spark: SparkSession,
      root: String): (Long, Long, Long, Long) = {
    val f = fs(spark, root)
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    var files = 0L
    var bytes = 0L
    var tombs = 0L
    manifestDirs(f, root, v).map(parseEntry).foreach {
      case (_, Some(_)) => tombs += 1
      case (dir, None) =>
        val it = f.listFiles(new Path(resolveDir(root, dir)), true)
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
            files += 1; bytes += st.getLen
          }
        }
    }
    (committedVersions(f, root).size.toLong, files, bytes, tombs)
  }

  /** Snapshot-read version `n` (time travel). Multi-dir versions (from
    * [[commitAppend]]) read with mergeSchema so an appended shard may
    * ADD nullable columns (older rows surface them as null — the
    * parquet schema-evolution contract); single-dir reads keep the
    * cheaper footer-sampling path. */
  def readVersion(spark: SparkSession, root: String, n: Long): DataFrame = {
    val f = fs(spark, root)
    require(f.exists(new Path(s"$root/_commits/$n")),
      s"version $n was never committed at $root")
    val entries = manifestDirs(f, root, n)
    if (!hasTombstones(entries)) {
      val dirs = entries.map(d => resolveDir(root, d))
      if (dirs.size == 1) readDir(spark, f, dirs.head)
      else if (dirs.exists(isPartitionedDir(f, _)))
        // partitioned dirs need per-dir basePath — a multi-path read
        // cannot resolve partition columns across distinct roots
        dirs.map(readDir(spark, f, _))
          .reduce(_.unionByName(_, allowMissingColumns = true))
      else try spark.read.option("mergeSchema", "true").parquet(dirs: _*)
      catch {
        // WIDENED chains (r13, ALTER COLUMN TYPE): parquet footer
        // merging refuses int32-vs-int64 shards, but UNION coerces
        // them to the wider member — re-read per dir and union. Only
        // widened tables pay the fallback (and only its plan has N
        // scan nodes); never-widened chains keep the single merged
        // scan.
        case e: Exception
            if e.getMessage != null &&
              e.getMessage.contains("CANNOT_MERGE") =>
          dirs.map(readDir(spark, f, _))
            .reduce(_.unionByName(_, allowMissingColumns = true))
      }
    } else {
      // ordered fold: a tombstone deletes its keys from everything
      // BEFORE it in the entry list; rows appended AFTER the tombstone
      // (a re-insert of a deleted key) survive. This is the order
      // Delta's log replay gives remove/add actions.
      entries.map(parseEntry).foldLeft(Option.empty[DataFrame]) {
        case (acc, (dir, None)) =>
          val d = readDir(spark, f, resolveDir(root, dir))
          Some(acc.fold(d)(_.unionByName(d, allowMissingColumns = true)))
        case (acc, (dir, Some(keyCol))) =>
          val cols = tombstoneCols(keyCol)
          val keys = spark.read.parquet(resolveDir(root, dir))
            .select(cols.map(col): _*).distinct()
          val base = acc.getOrElse(sys.error(
            s"tombstone $dir precedes any data dir at $root"))
          // a USING-column anti-join moves the key columns to the FRONT
          // of the output — restore the committed column order, or a
          // tombstone on a non-leading column silently reorders the
          // table's schema (found by the r13 dynamic-overwrite work:
          // positional INSERTs then bind wrong columns)
          Some(base.join(keys, cols, "left_anti")
            .select(base.columns.map(col).toSeq: _*))
      }.getOrElse(sys.error(s"empty manifest for version $n at $root"))
    }
  }

  /** Read the current committed snapshot. Fails loud on a table with no
    * committed version — an uninitialized (or all-torn) table is a
    * caller bug, not an empty frame. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val n = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    readVersion(spark, root, n)
  }

  /** A `partitionBy` spec is ONE column name or a COMMA-SEPARATED list
    * (r13, multi-level layouts: "year,source" → `year=…/source=…`
    * nested dirs). Column names may not contain ',' (the manifest
    * reserves it), so the split is unambiguous and every single-column
    * caller parses unchanged. */
  private[graft] def partitionCols(spec: String): Seq[String] =
    spec.split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  /** Write `df` as a fresh immutable snapshot dir (plus its optional
    * stats sidecar) and return its root-relative path — the shared
    * first phase of every commit flavor (r9 review: previously
    * triplicated across commit/commitIf/appendCore). */
  private def writeSnapshot(df: DataFrame, root: String,
      statsCols: Seq[String], partitionBy: Option[String] = None,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 20): String = {
    val spark = df.sparkSession
    val dataRel = s"data/${java.util.UUID.randomUUID().toString}"
    val w = df.write.mode("overwrite")
    partitionBy.fold(w)(c => w.partitionBy(partitionCols(c): _*))
      .parquet(s"$root/$dataRel")
    // every declared sidecar (num/str stats AND blooms) in one job (r15)
    writeAllSidecars(spark, fs(spark, root), s"$root/$dataRel",
      statsCols, bloomCols, bloomBits)
    dataRel
  }

  /** All LEAF partition directories under a hive-partitioned snapshot
    * dir (r13, multi-level): depth-first through the `col=value` chain,
    * each leaf as (relative path, partition (col, rawValue) pairs in
    * nesting order). Single-level dirs yield their immediate children —
    * every pre-r13 layout walks unchanged. */
  private def partitionLeafDirs(f: FileSystem,
      abs: String): Seq[(String, Seq[(String, String)])] = {
    def recurse(p: Path, rel: String,
        parts: Seq[(String, String)]): Seq[(String, Seq[(String, String)])] = {
      val children = f.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      if (children.isEmpty) {
        if (parts.isEmpty) Seq.empty else Seq((rel, parts))
      } else children.flatMap { st =>
        val n = st.getPath.getName
        val eq = n.indexOf('=')
        recurse(st.getPath, if (rel.isEmpty) n else s"$rel/$n",
          parts :+ ((n.substring(0, eq), n.substring(eq + 1))))
      }
    }
    recurse(new Path(abs), "", Nil)
  }

  /** A snapshot dir is HIVE-PARTITIONED iff its immediate children are
    * `col=value` subdirectories — self-describing, so readers never
    * depend on commit metadata to pick the right scan shape (a delete
    * or append on a partitioned table needs no special flags). */
  private def isPartitionedDir(f: FileSystem, path: String): Boolean = {
    val p = new Path(path)
    f.exists(p) && f.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.contains("="))
  }

  /** Read one snapshot dir, partition-aware: a partitioned dir reads
    * with itself as basePath (partition columns materialize from the
    * dir names), a flat dir reads plainly. */
  private def readDir(spark: SparkSession, f: FileSystem,
      dir: String): DataFrame =
    if (isPartitionedDir(f, dir))
      spark.read.option("basePath", dir).parquet(dir)
    else spark.read.parquet(dir)

  /** Re-stamp a just-published manifest's mtime to NOW (r11, r10
    * advice): FS rename PRESERVES mtime, so without this the manifest
    * carries its STAGING time — a writer that spun in the CAS loop
    * would publish a manifest whose mtime predates its visibility, and
    * [[versionAsOf]] could resolve a timestamp to a version that did
    * not yet exist at that instant. Always returns true so it can ride
    * the rename's && chain inside the publish lock. */
  private def stampPublish(f: FileSystem, target: Path): Boolean = {
    f.setTimes(target, System.currentTimeMillis(), -1)
    true
  }

  /** Stage a manifest body under `_tmp/` (invisible to readers) and
    * return its path, ready for the atomic publish rename. */
  private def stageManifest(f: FileSystem, root: String, tag: String,
      body: String): Path = {
    val tmp = new Path(s"$root/_tmp/$tag")
    val out = f.create(tmp, false)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    f.mkdirs(new Path(s"$root/_commits"))
    tmp
  }

  /** Commit `df` as the next version of the table at `root`; returns
    * the committed version number. The data write happens BEFORE any
    * publish step — a crash anywhere leaves the previous version
    * untouched and visible.
    *
    * `statsCols` (data skipping): for each named LONG-castable column,
    * per-file min/max are computed from the freshly-written snapshot and
    * stored in an underscore-prefixed sidecar INSIDE the snapshot dir
    * (`data/<uuid>/_stats.tsv` — invisible to parquet readers, and
    * published atomically with the data because the pointer swap happens
    * after). [[readPruned]] then opens only the files whose range
    * overlaps a predicate — the Delta/Iceberg file-skipping core. Stats
    * cost one extra scan of the new snapshot at commit time (file-local
    * aggregation, no shuffle: the groupBy key IS the input file). */
  def commit(df: DataFrame, root: String, statsCols: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty): Long = {
    val f = fs(df.sparkSession, root)
    val dataRel = writeSnapshot(df, root, statsCols)
    publishFull(f, root, dataRel, manifestBody(dataRel, meta))
  }

  /** CAS-publish a staged full-snapshot manifest: retry the rename at
    * the next version number until we win (rename-without-overwrite
    * fails if a concurrent writer took N first). */
  private def publishFull(f: FileSystem, root: String, dataRel: String,
      body: String): Long = {
    var tmp = stageManifest(f, root, dataRel.stripPrefix("data/"), body)
    var n = committedVersions(f, root).foldLeft(0L)(math.max) + 1
    var published = false
    var attempt = 0
    while (!published) {
      // a failed rename does NOT always mean the version was taken: the
      // staged manifest may be gone (concurrent vacuum of _tmp, transient
      // FS fault) — re-stage it before retrying, and bound the loop so a
      // persistent fault fails loud instead of spinning on n forever
      // (r10 advice)
      attempt += 1
      require(attempt <= 10000,
        s"commit at $root failed to publish after $attempt attempts " +
          s"(last tried version $n) — filesystem fault or runaway contention")
      if (!f.exists(tmp))
        tmp = stageManifest(f, root,
          s"${dataRel.stripPrefix("data/")}-$attempt", body)
      val target = new Path(s"$root/_commits/$n")
      publishLock(root).synchronized {
        if (f.exists(target)) n += 1
        else if (f.rename(tmp, target)) { stampPublish(f, target); published = true }
        else if (f.exists(target)) n += 1
        // else: rename failed with the slot still free — loop re-stages
      }
    }
    n
  }

  /** True when `a` and `b` sit on the same LOSSLESS widening chain
    * (either direction): byte→short→int→long, float→double, or
    * same-scale decimals of different precision. Mixed shards of chain
    * types are read-safe — per-dir reads union-coerce to the wider
    * member, and an explicit wider read schema makes the parquet
    * readers widen each file's values (verified: Spark 4's vectorized
    * reader promotes INT32→int64, FLOAT→double, and int32-backed
    * decimal(9,s)→decimal(18,s) when the requested schema says so) —
    * which is what makes ALTER COLUMN TYPE a metadata-only operation. */
  private[graft] def sameWideningChain(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    val ints: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    val fps: Set[DataType] = Set(FloatType, DoubleType)
    (a, b) match {
      case _ if a == b => false
      case (d1: DecimalType, d2: DecimalType) => d1.scale == d2.scale
      case _ => (ints(a) && ints(b)) || (fps(a) && fps(b))
    }
  }

  /** The wider member of a same-chain pair (callers guarantee
    * [[sameWideningChain]] holds). */
  private[graft] def widerType(
      a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    (a, b) match {
      case (d1: DecimalType, d2: DecimalType) =>
        if (d1.precision >= d2.precision) a else b
      case _ =>
        val order: Seq[DataType] =
          Seq(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
        if (order.indexOf(a) >= order.indexOf(b)) a else b
    }
  }

  /** Structural type with every nullability flag normalized — the
    * append guard's comparison domain (nullability differences are not
    * type changes; reads union schemas as nullable regardless). */
  private def ignoreNullability(dt: org.apache.spark.sql.types.DataType):
      org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case ArrayType(e, _)  => ArrayType(ignoreNullability(e), true)
      case MapType(k, v, _) => MapType(ignoreNullability(k), ignoreNullability(v), true)
      case StructType(fs)   => StructType(fs.map(f => StructField(
        f.name, ignoreNullability(f.dataType), nullable = true)))
      case other            => other
    }
  }

  /** The version's data dirs when — and only when — they are ALL flat
    * (no tombstone entries, no hive-partitioned dirs): the shape a
    * file-based scan can serve directly with no fold. None otherwise.
    * The SQL catalog uses this to route reads onto Spark's native
    * vectorized parquet scan when possible (r11). */
  private[graft] def flatDataDirs(spark: SparkSession, root: String,
      version: Long): Option[Seq[String]] = {
    val f = fs(spark, root)
    val entries = manifestDirs(f, root, version).map(parseEntry)
    val flat = entries.forall {
      case (dir, None) => !isPartitionedDir(f, resolveDir(root, dir))
      case _           => false
    }
    if (flat) Some(entries.map(e => resolveDir(root, e._1))) else None
  }

  /** Write stats/bloom sidecars onto an ALREADY-WRITTEN snapshot dir
    * (r12, the native write path's indexing half): called by the SQL
    * writers between the executor fan-out and the manifest publish, so
    * declared-index tables (`graft.stats`/`graft.bloom` properties)
    * keep their sidecars current on every INSERT — published atomically
    * with the data because the pointer swap happens after. Costs one
    * extra scan of the NEW dir per declared sidecar kind (O(batch),
    * the same bill the programmatic commitIndexed pays). */
  private[graft] def writeSidecars(spark: SparkSession, root: String,
      dataRel: String, statsCols: Seq[String], bloomCols: Seq[String],
      bloomBits: Int = 1 << 20): Unit = {
    writeAllSidecars(spark, fs(spark, root), s"$root/$dataRel",
      statsCols, bloomCols, bloomBits)
  }

  /** Publish an ALREADY-WRITTEN snapshot dir as the next FULL version
    * (r11, the native V2 writer's commit half: executors have streamed
    * parquet into `root/<dataRel>` — invisible until this rename). */
  private[graft] def publishDirFull(spark: SparkSession, root: String,
      dataRel: String, meta: Map[String, String] = Map.empty): Long =
    publishFull(fs(spark, root), root, dataRel, manifestBody(dataRel, meta))

  /** OCC-pinned [[publishDirFull]] (r12, r11 advice medium): publish an
    * already-written snapshot dir as version `expectedBase + 1` ONLY if
    * the table is still at `expectedBase` — the [[commitIf]] contract
    * for the native V2 write path. A full-snapshot REPLACE computed
    * from a pinned scan silently discards any commit that landed
    * between the pin and the publish; losers throw
    * [[java.util.ConcurrentModificationException]] loud (the orphan
    * snapshot is vacuum fodder, never visible). */
  private[graft] def publishDirFullIf(spark: SparkSession, root: String,
      dataRel: String, expectedBase: Long,
      meta: Map[String, String] = Map.empty): Long =
    casPublish(spark, root, expectedBase, dataRel.stripPrefix("data/"),
      manifestBody(dataRel, meta))

  /** OCC-pinned DELTA publish (r12, the native half of the SQL delta
    * row-level ops): extend `expectedBase`'s manifest with an optional
    * tombstone of the touched keys and an optional dir of replacement/
    * new rows — ONE atomic rename, so no reader ever sees the delete
    * without the insert (the [[commitUpsert]] shape, fed by executor-
    * written dirs instead of a DataFrame). CAS at `expectedBase + 1`:
    * row-level deltas are computed against the pinned scan, so unlike
    * blind appends they must NOT rebase over a concurrent commit —
    * losers throw [[java.util.ConcurrentModificationException]]. */
  private[graft] def publishDeltaIf(spark: SparkSession, root: String,
      expectedBase: Long, keyCols: Seq[String], keysRel: Option[String],
      rowsRel: Option[String], meta: Map[String, String] = Map.empty): Long = {
    require(keysRel.nonEmpty || rowsRel.nonEmpty,
      "delta publish needs keys, rows, or both")
    require(keyCols.nonEmpty && keyCols.distinct == keyCols,
      s"delta key columns must be non-empty and distinct: $keyCols")
    keyCols.foreach { keyCol =>
      require(!keyCol.contains(',') && !keyCol.contains('\n') &&
        !keyCol.contains('@') && !keyCol.contains('+'),
        s"delta key column must be free of ',', '@', '+' and newlines: $keyCol")
    }
    // composite keys land as the r12 `~dir@a+b` tombstone form — every
    // reader already folds the tuple anti-join (r13, r12 verdict item 3)
    val keySpec = keyCols.mkString("+")
    val f = fs(spark, root)
    val dirs = manifestDirs(f, root, expectedBase) ++
      keysRel.map(k => s"~$k@$keySpec").toSeq ++ rowsRel.toSeq
    casPublish(spark, root, expectedBase,
      s"delta-${java.util.UUID.randomUUID()}",
      manifestBody(dirs.mkString(","), meta))
  }

  /** DYNAMIC PARTITION OVERWRITE publish (r13, r12 verdict item 6):
    * replace exactly the partitions the freshly-written snapshot dir
    * `dataRel` touches, leaving every other partition's files (and the
    * prior manifest entries) untouched — the
    * `partitionOverwriteMode=dynamic` contract, expressed in the
    * manifest language the readers already fold: ONE extension
    * `…prior dirs, ~touchedPartitionTuples@a+b, dataRel`. The
    * tombstone's keys are the partition VALUES of the new dir's leaf
    * directories (derived from the listing — no data scan), so the old
    * copies of those partitions anti-join away and the new dir
    * re-inserts them; refreshing one day of a 100 TB table writes one
    * day, not 100 TB. The old partition dirs keep being LISTED (and
    * scanned, then folded empty) until a compacting commit collapses
    * the chain — the standard tombstone read tax, honestly the trade
    * against Delta's per-file log (which drops replaced files from the
    * listing immediately).
    *
    * CAS-pinned at `expectedBase` like every replace computed from a
    * pinned scan. NULL partition values refuse loud: an anti-join on a
    * null key matches nothing, so the sentinel partition cannot be
    * dynamically replaced — rewrite it explicitly instead. */
  private[graft] def publishDynamicOverwrite(spark: SparkSession,
      root: String, dataRel: String, partColsSeq: Seq[String],
      expectedBase: Long, meta: Map[String, String] = Map.empty): Long = {
    require(partColsSeq.nonEmpty, "dynamic overwrite needs partition columns")
    val f = fs(spark, root)
    val leaves = partitionLeafDirs(f, s"$root/$dataRel")
    require(leaves.nonEmpty,
      s"dynamic overwrite wrote no partition dirs under $dataRel")
    val tuples = leaves.map { case (rel, parts) =>
      val byCol = parts.toMap
      require(parts.map(_._1) == partColsSeq,
        s"partition chain $rel does not match declared columns $partColsSeq")
      partColsSeq.map { c =>
        val raw = byCol(c)
        require(raw != hiveDefaultPartition,
          s"dynamic overwrite cannot replace the NULL partition ($rel): " +
            "a null key matches no rows in the tombstone anti-join — " +
            "rewrite the null partition explicitly")
        unescapePathName(raw)
      }
    }.distinct
    // type the tuples at the TABLE schema (the dir names are strings;
    // the anti-join must compare at the column type, same cast rule as
    // the partition-column reconstruction in scanPruned)
    val schema = readVersion(spark, root, expectedBase).schema
    val strSchema = org.apache.spark.sql.types.StructType(partColsSeq.map(c =>
      org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType, nullable = false)))
    val strDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        tuples.map(t => org.apache.spark.sql.Row(t: _*)), 1), strSchema)
    val typed = strDf.select(partColsSeq.map(c =>
      col(c).cast(schema(c).dataType).as(c)): _*)
    val keysRel = writeSnapshot(typed, root, Nil)
    publishDeltaIf(spark, root, expectedBase, partColsSeq, Some(keysRel),
      Some(dataRel), meta)
  }

  /** STATIC partition replace (r13, `INSERT OVERWRITE t PARTITION
    * (col=v, …)`): replace exactly the partition subtree the statement
    * NAMES — one `…prior, ~(v,…)@cols, dataRel` extension, the
    * [[publishDynamicOverwrite]] shape with the tuple taken from the
    * statement instead of the written dirs (so an EMPTY batch still
    * clears the named partition, per SQL semantics). Values must be
    * non-null (a null key anti-joins nothing). CAS-pinned. */
  private[graft] def publishPartitionReplace(spark: SparkSession,
      root: String, dataRel: Option[String], colVals: Seq[(String, Any)],
      expectedBase: Long, meta: Map[String, String] = Map.empty): Long = {
    require(colVals.nonEmpty, "partition replace needs at least one column")
    colVals.foreach { case (c, v) =>
      require(v != null,
        s"cannot replace the NULL partition of $c: a null key matches " +
          "no rows in the tombstone anti-join — rewrite it explicitly")
    }
    val schema = readVersion(spark, root, expectedBase).schema
    val cols = colVals.map(_._1)
    val strSchema = org.apache.spark.sql.types.StructType(cols.map(c =>
      org.apache.spark.sql.types.StructField(c,
        org.apache.spark.sql.types.StringType, nullable = false)))
    val strDf = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(colVals.map(_._2.toString): _*)), 1),
      strSchema)
    val typed = strDf.select(cols.map(c =>
      col(c).cast(schema(c).dataType).as(c)): _*)
    val keysRel = writeSnapshot(typed, root, Nil)
    publishDeltaIf(spark, root, expectedBase, cols, Some(keysRel),
      dataRel, meta)
  }

  /** [[publishPartitionReplace]] from a DataFrame (the V1 write-bridge
    * path). An EMPTY batch publishes the tombstone alone — the named
    * partition clears, per INSERT OVERWRITE semantics (the fileless
    * snapshot dir would otherwise break read-time schema inference). */
  def commitReplaceWhere(df: DataFrame, root: String, partSpec: String,
      colVals: Seq[(String, Any)], expectedBase: Long,
      statsCols: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty): Long = {
    val spark = df.sparkSession
    val dataRel = writeSnapshot(df, root, statsCols,
      partitionBy = Some(partSpec))
    val f = fs(spark, root)
    val hasFiles = {
      val it = f.listFiles(new Path(s"$root/$dataRel"), true)
      var found = false
      while (!found && it.hasNext) {
        val st = it.next()
        found = st.isFile && st.getPath.getName.endsWith(".parquet")
      }
      found
    }
    if (!hasFiles) f.delete(new Path(s"$root/$dataRel"), true)
    publishPartitionReplace(spark, root,
      if (hasFiles) Some(dataRel) else None, colVals, expectedBase, meta)
  }

  /** [[publishDynamicOverwrite]] from a DataFrame (the V1 write-bridge
    * path): write the batch hive-partitioned, then publish the
    * replace-touched-partitions extension. O(batch) end to end. */
  def commitReplacePartitions(df: DataFrame, root: String, partSpec: String,
      expectedBase: Long, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty): Long = {
    val cols = partitionCols(partSpec)
    cols.foreach { c =>
      require(df.schema.fieldNames.contains(c),
        s"partition column $c absent from the batch schema")
    }
    val spark = df.sparkSession
    val dataRel = writeSnapshot(df, root, statsCols,
      partitionBy = Some(partSpec), bloomCols = bloomCols)
    publishDynamicOverwrite(spark, root, dataRel, cols, expectedBase, meta)
  }

  /** Shared OCC publish: stage `body`, rename to `expectedBase + 1`
    * only if the table is still at `expectedBase`; loud CME on loss. */
  private def casPublish(spark: SparkSession, root: String,
      expectedBase: Long, tag: String, body: String): Long = {
    val f = fs(spark, root)
    val cur = committedVersions(f, root).foldLeft(0L)(math.max)
    if (cur != expectedBase)
      throw new java.util.ConcurrentModificationException(
        s"table at $root moved to version $cur while this writer " +
          s"computed from $expectedBase; re-read and recompute")
    val tmp = stageManifest(f, root, tag, body)
    val target = new Path(s"$root/_commits/${expectedBase + 1}")
    val occLost = publishLock(root).synchronized {
      f.exists(target) || !f.rename(tmp, target) || !stampPublish(f, target)
    }
    if (occLost) {
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"version ${expectedBase + 1} at $root was taken concurrently; " +
          "re-read and recompute")
    }
    expectedBase + 1
  }

  /** TABLE-LEVEL properties (r12): one small `_props` file at the table
    * root holding `key<TAB>value` lines — the SQL catalog's home for a
    * declared primary key (`key` → rowId of the delta row-level ops)
    * and the partition column (`partition` → layout of SQL INSERTs).
    * Deliberately OUTSIDE the version chain: properties describe the
    * table contract, not a snapshot — exactly where Delta keeps its
    * table configuration. One small-file read per lookup; updates
    * rewrite the whole (tiny) file under the per-root publish lock. */
  def tableProps(spark: SparkSession, root: String): Map[String, String] = {
    val f = fs(spark, root)
    val p = new Path(s"$root/_props")
    if (!f.exists(p)) Map.empty
    else readLines(f, p).flatMap { l =>
      l.split('\t') match {
        case Array(k, v) => Some(k -> v)
        case _           => None
      }
    }.toMap
  }

  /** Merge `props` into the table's property file (last write wins per
    * key; a null-valued entry removes the key). */
  def setTableProps(spark: SparkSession, root: String,
      props: Map[String, String]): Unit = {
    props.foreach { case (k, v) =>
      require(!k.contains('\t') && !k.contains('\n') &&
        (v == null || (!v.contains('\t') && !v.contains('\n'))),
        s"table property must be tab/newline-free: $k=$v")
    }
    val f = fs(spark, root)
    publishLock(root).synchronized {
      val merged = (tableProps(spark, root) ++ props).filter(_._2 != null)
      val tmp = new Path(s"$root/_tmp/props-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(merged.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k\t$v" }.mkString("\n").getBytes("UTF-8"))
      finally out.close()
      // Rename OVER the target first: Hadoop local FS rename is POSIX
      // rename(2) (atomic overwrite), so the declared contract is never
      // missing mid-update; only on filesystems where rename refuses an
      // existing destination do we fall back to delete+rename (r12
      // advice, low — a crash between delete and rename must not drop
      // the partition/key/index contract).
      val propsPath = new Path(s"$root/_props")
      if (!f.rename(tmp, propsPath)) {
        f.delete(propsPath, false)
        require(f.rename(tmp, propsPath),
          s"failed to publish table properties at $root")
      }
    }
  }

  /** Publish an already-written snapshot dir as a manifest-extension
    * APPEND — the lean rebase loop of [[appendCore]] without the
    * dedup/upsert/schema machinery (the V2 write path already resolved
    * the schema against the table before any executor wrote a row). */
  private[graft] def publishDirAppend(spark: SparkSession, root: String,
      dataRel: String, meta: Map[String, String] = Map.empty): Long = {
    val f = fs(spark, root)
    f.mkdirs(new Path(s"$root/_commits"))
    var attempt = 0
    while (true) {
      val base = committedVersions(f, root).foldLeft(0L)(math.max)
      require(base >= 1, s"append to uninitialized table at $root — commit first")
      val dirs = manifestDirs(f, root, base) :+ dataRel
      val tmp = stageManifest(f, root,
        s"${dataRel.stripPrefix("data/")}-$attempt",
        manifestBody(dirs.mkString(","), meta))
      val target = new Path(s"$root/_commits/${base + 1}")
      val won = publishLock(root).synchronized {
        !f.exists(target) && f.rename(tmp, target) && stampPublish(f, target)
      }
      if (won) return base + 1
      f.delete(tmp, false)
      attempt += 1
    }
    -1L // unreachable
  }

  /** APPEND commit (r9): publish `df` as new data ADDED to the current
    * version — the manifest of version N+1 lists the previous version's
    * snapshot dirs plus one fresh dir, so the commit cost is
    * O(appended data) while a full [[commit]] of the grown table would
    * be O(table): the difference between ingesting a shard into a
    * 100 TB table in seconds and rewriting 100 TB. This is the
    * file-level add-log half of the production formats' manifest
    * design (deletes still go through full-snapshot rewrite).
    *
    * Concurrency: appends REBASE instead of failing — if a racer takes
    * our version number, the data dir is already written and only the
    * manifest needs recomputing against the racer's dir list, so the
    * retry loop re-resolves and re-stages until the rename wins. Two
    * concurrent appenders therefore both land, in either order, and
    * neither loses rows — unlike a full-snapshot rewrite, appends
    * commute. (A concurrent FULL commit rebases the append onto the
    * rewrite, which is the correct Delta semantics for blind appends.)
    *
    * Schema: the appended shard may add nullable columns; readers see
    * them null-filled on older rows via mergeSchema ([[readVersion]]). */
  def commitAppend(df: DataFrame, root: String, statsCols: Seq[String] = Nil,
      meta: Map[String, String] = Map.empty,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 20): Long =
    appendCore(df, root, statsCols, meta, dedupKey = None,
      bloomCols = bloomCols, bloomBits = bloomBits)
      .getOrElse(sys.error("unreachable: dedup-free append cannot no-op"))

  /** The rebase loop shared by [[commitAppend]] and [[appendIdempotent]].
    * Per-iteration order is RESOLVE tip → CHECK dedup marker → RENAME
    * to tip+1, and that order is what makes the idempotence check
    * serializable (r9 review): a racer that published the marker
    * before our resolve is seen by the check; a racer that published
    * after our resolve holds a version ≥ our target, so our
    * rename-without-overwrite FAILS and the next iteration re-resolves
    * and sees the marker. Two replays of one batch therefore cannot
    * both land — one of the two renames loses and its next check
    * aborts. */
  private def appendCore(df: DataFrame, root: String, statsCols: Seq[String],
      meta: Map[String, String], dedupKey: Option[(String, String)],
      upsertKey: Option[String] = None,
      partitionBy: Option[String] = None,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 20): Option[Long] = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    upsertKey.foreach { k =>
      require(df.schema.fieldNames.contains(k),
        s"upsert key column $k absent from the batch schema")
      require(!k.contains(',') && !k.contains('\n') && !k.contains('@') &&
        !k.contains('+'),
        s"upsert key column must be free of ',', '@', '+' and newlines: $k")
    }
    lazy val written: String = // data written once, on first need
      writeSnapshot(df, root, statsCols, partitionBy, bloomCols, bloomBits)
    lazy val keysWritten: String = // upsert tombstone keys, written once:
      // derived from the already-written snapshot, NOT by re-evaluating
      // `df` — a non-deterministic batch (or one reading a moving
      // source) evaluated twice could tombstone keys whose replacement
      // rows were never written, silently losing them (r10 advice;
      // Delta materializes the MERGE source for exactly this reason)
      writeSnapshot(
        readDir(spark, f, s"$root/$written").select(upsertKey.get).distinct(),
        root, Nil)
    f.mkdirs(new Path(s"$root/_commits"))
    var attempt = 0
    while (true) {
      val base = committedVersions(f, root).foldLeft(0L)(math.max)
      require(base >= 1, s"append to uninitialized table at $root — commit first")
      val replayed = dedupKey.exists { case (app, bid) =>
        history(spark, root).exists { case (_, _, m) =>
          m.get("txnAppId").contains(app) && m.get("txnVersion").contains(bid) }
      }
      if (replayed) return None
      // SCHEMA ENFORCEMENT at write time (r10, Delta's contract): a
      // shard may ADD nullable columns (mergeSchema null-fills older
      // rows) but a shared column changing TYPE would poison the table
      // — every subsequent read of the version chain fails, long after
      // the writer is gone. Reject it HERE, where the writer can fix
      // it, not at read time. Cost: one tip schema resolve per attempt
      // (footer sampling, O(dirs) small reads) — the same cost class
      // as the history scan appendIdempotent already pays per batch.
      // Hive-PARTITION columns are exempt: their
      // read-side type is INFERRED from directory names (int for
      // numeric values), not declared by the data, so comparing it to
      // the shard's declared type is a false mismatch by construction.
      // Name comparison follows the analyzer's resolution: when
      // spark.sql.caseSensitive is false (the default) the guard keys
      // on lowercased names, otherwise a shard declaring `ID string`
      // against a base `id long` would BYPASS the type check and poison
      // read-time unionByName anyway (r10 advice).
      val caseSensitive =
        spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
      def resolvedName(n: String): String =
        if (caseSensitive) n else n.toLowerCase(java.util.Locale.ROOT)
      val partCols: Set[String] = (manifestDirs(f, root, base)
        .map(parseEntry).collect { case (dir, None) => resolveDir(root, dir) }
        .filter(isPartitionedDir(f, _))
        // every LEVEL's column names (r13: nested a=v/b=w chains)
        .flatMap(d => partitionLeafDirs(f, d).flatMap(_._2.map(_._1)))
        .toSet ++ partitionBy.toSeq.flatMap(partitionCols)).map(resolvedName)
      val baseFields = readVersion(spark, root, base).schema.fields
        .map(fld => resolvedName(fld.name) -> fld.dataType).toMap
      df.schema.fields
        .filterNot(fld => partCols.contains(resolvedName(fld.name)))
        .foreach { fld =>
          baseFields.get(resolvedName(fld.name)).foreach { t =>
            // nullability-insensitive: a shard tightening (or loosening)
            // nullability is not a type change — every read path unions
            // schemas as nullable anyway (r11; strict equality rejected
            // `array<long> not-null` into `array<long>`). Same-chain
            // WIDENING shards are accepted (r13, ALTER COLUMN TYPE):
            // lossless either direction — readVersion union-coerces
            // mixed chains to the wider member, so they cannot poison
            // reads the way a string-into-long shard would.
            require(ignoreNullability(t) == ignoreNullability(fld.dataType)
              || sameWideningChain(ignoreNullability(t),
                ignoreNullability(fld.dataType)),
              s"appended shard changes column ${fld.name} from $t to " +
                s"${fld.dataType} at $root — a type change needs a full " +
                "rewrite commit, not an append")
          }
        }
      val dataRel = written
      // an upsert's manifest extension is tombstone-then-data: the keys
      // delete every prior copy, the fresh dir re-inserts the new rows —
      // ONE atomic publish, so no reader ever sees the delete without
      // the insert
      val dirs = manifestDirs(f, root, base) ++
        upsertKey.map(k => s"~$keysWritten@$k").toSeq :+ dataRel
      val tmp = stageManifest(f, root, s"${dataRel.stripPrefix("data/")}-$attempt",
        manifestBody(dirs.mkString(","), meta))
      val target = new Path(s"$root/_commits/${base + 1}")
      val won = publishLock(root).synchronized {
        !f.exists(target) && f.rename(tmp, target) && stampPublish(f, target)
      }
      if (won) return Some(base + 1)
      f.delete(tmp, false) // staged manifest of the lost round
      attempt += 1 // racer took the slot: rebase onto the new tip
    }
    None // unreachable
  }

  /** ROW-LEVEL DELETE without rewriting the table (r9): commit the
    * DELETED KEYS as a tombstone entry (`~data/<uuid>@<keyCol>`) that
    * extends the manifest exactly like an append — cost O(deleted
    * keys), never O(table), the same economics [[commitAppend]] gives
    * inserts and the gap Delta fills with deletion vectors. Readers
    * fold entries in order, so a key re-appended AFTER its tombstone
    * survives (log-replay semantics); every read of a tombstoned
    * version pays one anti-join per tombstone, and a periodic full
    * [[commit]] of `read(...)` (compaction) collapses the chain back
    * to a single clean dir. [[readPruned]] on a tombstoned version
    * prunes by stats first, then folds the tombstone anti-joins over
    * the pruned scan (r10 — the deletion-vector read shape).
    * The CDC slow path handles tombstone steps (the
    * file-level fast path is gated to pure data-dir extensions). */
  def commitDelete(spark: SparkSession, root: String, keyCol: String,
      keys: DataFrame, meta: Map[String, String] = Map.empty): Long =
    commitDeleteComposite(spark, root, Seq(keyCol), keys, meta)

  /** COMPOSITE-KEY tombstone delete (r12, r11 verdict item 6): delete
    * every row whose `(keyCols...)` TUPLE appears in `keys` — the
    * manifest entry is `~data/<uuid>@a+b`, readers anti-join on all key
    * columns in log order. `DELETE FROM t WHERE a = 1 AND b = 2` is one
    * single-row composite tombstone: O(keys), never a rewrite, where
    * r11 silently downgraded to a full-table copy-on-write. Same
    * economics, concurrency (rebase loop), and compaction story as the
    * single-column form — which is now just the 1-column case. */
  def commitDeleteComposite(spark: SparkSession, root: String,
      keyCols: Seq[String], keys: DataFrame,
      meta: Map[String, String] = Map.empty): Long = {
    require(keyCols.nonEmpty, "composite tombstone needs at least one column")
    require(keyCols.distinct == keyCols,
      s"composite tombstone columns must be distinct: $keyCols")
    keyCols.foreach { c =>
      require(keys.schema.fieldNames.contains(c),
        s"keys frame must carry the key column $c")
      // the tombstone entry is parsed as `~<dir>@<a+b>` inside a
      // comma-separated manifest line — a metacharacter in a column
      // name would corrupt the manifest for every future reader (r10
      // advice; '+' joined the reserved set with composite keys)
      require(!c.contains(',') && !c.contains('\n') && !c.contains('@') &&
        !c.contains('+'),
        s"tombstone key column must be free of ',', '@', '+' and newlines: $c")
    }
    val keySpec = keyCols.mkString("+")
    val f = fs(spark, root)
    val dataRel = writeSnapshot(
      keys.select(keyCols.map(col): _*).distinct(), root, Nil)
    f.mkdirs(new Path(s"$root/_commits"))
    var attempt = 0
    while (true) {
      val base = committedVersions(f, root).foldLeft(0L)(math.max)
      require(base >= 1, s"delete from uninitialized table at $root")
      val dirs = manifestDirs(f, root, base) :+ s"~$dataRel@$keySpec"
      val tmp = stageManifest(f, root,
        s"${dataRel.stripPrefix("data/")}-$attempt",
        manifestBody(dirs.mkString(","), meta))
      val target = new Path(s"$root/_commits/${base + 1}")
      val won = publishLock(root).synchronized {
        !f.exists(target) && f.rename(tmp, target) && stampPublish(f, target)
      }
      if (won) return base + 1
      f.delete(tmp, false)
      attempt += 1
    }
    -1L // unreachable
  }

  /** IDEMPOTENT streaming append (r9): the exactly-once foreachBatch
    * sink contract. Structured Streaming guarantees at-least-once
    * foreachBatch invocation — after a crash between the sink's write
    * and the checkpoint commit, the SAME (queryId, batchId) is
    * replayed — so a bare [[commitAppend]] would duplicate that
    * batch's rows. This wrapper records `(txnAppId, txnVersion)` in
    * the commit metadata and SKIPS the append when the table's history
    * already holds a version with the same pair (Delta's idempotent-
    * writes contract, reduced to the same manifest mechanism as
    * [[history]]): replays become no-ops and the table sees each batch
    * exactly once. Returns Some(version) when the append landed, None
    * when it was a recognized replay. Usage:
    * {{{
    *   stream.writeStream.foreachBatch { (df, id) =>
    *     Txn.appendIdempotent(df, root, appId = "my-query", batchId = id)
    *     ()
    *   }
    * }}}
    * One history scan per micro-batch — O(versions) small-file reads;
    * vacuum keeps the last retained versions' metadata, so retention
    * must exceed the longest possible replay window (checkpoint
    * recovery replays only the LAST unfinished batch, so keepLast >= 2
    * suffices in practice). */
  def appendIdempotent(df: DataFrame, root: String, appId: String,
      batchId: Long, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 20,
      partitionBy: Option[String] = None): Option[Long] =
    appendCore(df, root, statsCols,
      meta = Map("txnAppId" -> appId, "txnVersion" -> batchId.toString) ++
        partitionBy.map("partitionCol" -> _),
      dedupKey = Some((appId, batchId.toString)),
      partitionBy = partitionBy,
      bloomCols = bloomCols, bloomBits = bloomBits)

  /** O(batch) transactional UPSERT (r10): publish `updates` as a ONE-
    * manifest extension `... ~keys@keyCol, data/<new>` — the tombstone
    * deletes every prior copy of the batch's keys, the fresh dir
    * re-inserts the new rows, and because both land in a single
    * rename-published manifest no reader can ever see the delete
    * without the insert (unlike chaining [[commitDelete]] +
    * [[commitAppend]], which exposes a keys-missing intermediate
    * version and can be torn by a crash between the two). Matched keys
    * are replaced whole-row, unmatched keys insert — MERGE upsert
    * semantics at O(batch) cost: Delta's MERGE rewrites every FILE
    * containing a matched key (read-match-rewrite), so upserting 1k
    * rows into a 100 TB table costs it a file rewrite wave; here it
    * costs the batch write + two small snapshots, with the read-side
    * anti-join tax accruing per upsert until a compacting [[commit]]
    * collapses the chain (same economics as [[commitDelete]] —
    * measured in UPSERT_r10.json). Concurrent upserts rebase like
    * appends; ordering between racers is the publish order, matching
    * last-writer-wins per key. */
  def commitUpsert(updates: DataFrame, root: String, keyCol: String,
      statsCols: Seq[String] = Nil, meta: Map[String, String] = Map.empty): Long =
    appendCore(updates, root, statsCols, meta, dedupKey = None,
      upsertKey = Some(keyCol))
      .getOrElse(sys.error("unreachable: dedup-free upsert cannot no-op"))

  /** EXACTLY-ONCE streaming MERGE (r10): [[commitUpsert]] with the
    * [[appendIdempotent]] replay guard — the foreachBatch upsert-sink
    * contract for a CDC stream landing in a Txn table. A replayed
    * (appId, batchId) is recognized against history inside the rebase
    * loop (same serializable check as appendIdempotent) and no-ops, so
    * at-least-once foreachBatch delivery becomes exactly-once MERGE:
    * re-upserting the same batch would not corrupt the final state
    * (upserts of identical rows are idempotent in value) but WOULD
    * stack redundant tombstone+dir pairs on the manifest and emit the
    * batch twice on the CDC feed — the guard keeps history and the
    * changes feed truthful. StreamingSpec drives it from a live
    * MemoryStream with every batch replayed. */
  def mergeIdempotent(updates: DataFrame, root: String, keyCol: String,
      appId: String, batchId: Long, statsCols: Seq[String] = Nil): Option[Long] =
    appendCore(updates, root, statsCols,
      meta = Map("txnAppId" -> appId, "txnVersion" -> batchId.toString),
      dedupKey = Some((appId, batchId.toString)), upsertKey = Some(keyCol))

  /** RESTORE (r10): roll the table back to retained version `toVersion`
    * by publishing that version's EXACT manifest entry list as the next
    * version — Delta's RESTORE. O(manifest): no data moves, no data is
    * read; the bad versions stay in history (an audit trail, and
    * time-travel to them still works until vacuum) but the current
    * snapshot is bit-identical to `toVersion`. The restore commit
    * itself re-references the old dirs, so a later [[vacuum]] keeps
    * them alive through the restored version — restoring is also how
    * you RESCUE data from a version about to age out. Fails loud if
    * `toVersion` was already vacuumed (its manifest is gone — nothing
    * left to restore). CDC across a restore diffs as a full rewrite
    * (delete the bad rows, re-insert the restored ones), which is the
    * truthful feed for a rollback. */
  def restore(spark: SparkSession, root: String, toVersion: Long,
      meta: Map[String, String] = Map.empty): Long = {
    val f = fs(spark, root)
    require(f.exists(new Path(s"$root/_commits/$toVersion")),
      s"version $toVersion at $root was never committed or was vacuumed")
    val dirs = manifestDirs(f, root, toVersion)
    val body = manifestBody(dirs.mkString(","),
      meta + ("restoredFrom" -> toVersion.toString))
    f.mkdirs(new Path(s"$root/_commits"))
    var attempt = 0
    while (true) {
      val base = committedVersions(f, root).foldLeft(0L)(math.max)
      val tmp = stageManifest(f, root, s"restore-$toVersion-$attempt", body)
      val target = new Path(s"$root/_commits/${base + 1}")
      val won = publishLock(root).synchronized {
        !f.exists(target) && f.rename(tmp, target) && stampPublish(f, target)
      }
      if (won) return base + 1
      f.delete(tmp, false)
      attempt += 1
    }
    -1L // unreachable
  }

  /** METADATA-ONLY commit (r13, the column-mapping carrier): publish
    * the CURRENT version's exact dir list as the next version with new
    * commit metadata — no data moves, O(manifest), the RESTORE shape
    * pointed at the tip. RENAME/DROP COLUMN ride this: the mapping
    * lives in the commit log, so `VERSION AS OF` a pre-rename version
    * naturally reads with the OLD mapping (Delta versions its column
    * mapping through the log the same way). */
  def commitMetaOnly(spark: SparkSession, root: String,
      meta: Map[String, String]): Long = {
    val f = fs(spark, root)
    var attempt = 0
    while (true) {
      val base = committedVersions(f, root).foldLeft(0L)(math.max)
      require(base >= 1, s"metadata commit on uninitialized table at $root")
      val dirs = manifestDirs(f, root, base)
      val tmp = stageManifest(f, root, s"meta-$base-$attempt",
        manifestBody(dirs.mkString(","), meta))
      val target = new Path(s"$root/_commits/${base + 1}")
      val won = publishLock(root).synchronized {
        !f.exists(target) && f.rename(tmp, target) && stampPublish(f, target)
      }
      if (won) return base + 1
      f.delete(tmp, false)
      attempt += 1
    }
    -1L // unreachable
  }

  /** Zero-copy SHALLOW CLONE (r10): initialize `dstRoot` as version 1
    * of a NEW table whose manifest references `srcRoot`'s current
    * snapshot dirs ABSOLUTELY — no data is copied, the clone of a
    * 100 TB table costs one manifest write (Delta SHALLOW CLONE).
    * The clone then diverges copy-on-write: appends/upserts/deletes on
    * the clone land in the CLONE's own `data/` and extend the CLONE's
    * manifest; the source never observes them, and rewrites of the
    * source never touch dirs the clone references (snapshots are
    * immutable). The one coupling — same as Delta's — is VACUUM of the
    * SOURCE: it cannot see the clone's references, so aggressive source
    * vacuum can delete dirs a clone still reads. Keep source retention
    * above clone lifetime, or deep-copy (a plain [[commit]] of
    * `read(clone)`) to sever the link. `srcRoot` must be absolute (or
    * a URI) so the references resolve from anywhere. */
  def cloneTable(spark: SparkSession, srcRoot: String, dstRoot: String,
      meta: Map[String, String] = Map.empty): Long = {
    require(srcRoot.startsWith("/") || srcRoot.contains("://"),
      s"clone source root must be an absolute path or URI: $srcRoot")
    require(!srcRoot.contains(',') && !srcRoot.contains('@'),
      s"clone source root must be free of ',' and '@': $srcRoot")
    val srcV = currentVersion(spark, srcRoot).getOrElse(
      sys.error(s"no committed version to clone at $srcRoot"))
    val f = fs(spark, dstRoot)
    require(committedVersions(f, dstRoot).isEmpty,
      s"clone target $dstRoot already has commits — refusing to overlay")
    val absEntries = manifestDirs(fs(spark, srcRoot), srcRoot, srcV).map { e =>
      val (dir, key) = parseEntry(e)
      val abs = resolveDir(srcRoot, dir)
      key.fold(abs)(k => s"~$abs@$k")
    }
    val body = manifestBody(absEntries.mkString(","),
      meta + ("clonedFrom" -> s"$srcRoot#$srcV"))
    val tmp = stageManifest(f, dstRoot, "clone-v1", body)
    val target = new Path(s"$dstRoot/_commits/1")
    val cloneWon = publishLock(dstRoot).synchronized {
      !f.exists(target) && f.rename(tmp, target) && stampPublish(f, target)
    }
    if (!cloneWon) {
      f.delete(tmp, false)
      sys.error(s"clone target $dstRoot was initialized concurrently")
    }
    1L
  }

  /** HIVE-PARTITIONED commit (r10): the snapshot dir is laid out as
    * `data/<uuid>/<partCol>=<value>/part-*.parquet` — the standard
    * warehouse idiom for time/tenant-keyed 100 TB corpora. The
    * partition column materializes from the directory names on read
    * (one column of storage saved per row), and partition-level
    * skipping ([[readPartitionPruned]]) needs no sidecar at all: the
    * directory listing IS the index. Layout is self-describing
    * (readers detect `col=` children), so deletes, upserts, restores,
    * clones and CDC all compose with partitioned snapshots unchanged.
    * Pair with [[commitAppendPartitioned]] for the canonical
    * ingest-one-day-at-a-time loop. */
  def commitPartitioned(df: DataFrame, root: String, partCol: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      bloomBits: Int = 1 << 20): Long = {
    partitionCols(partCol).foreach { c =>
      require(df.schema.fieldNames.contains(c),
        s"partition column $c absent from the schema")
    }
    val f = fs(df.sparkSession, root)
    val dataRel = writeSnapshot(df, root, statsCols,
      partitionBy = Some(partCol), bloomCols = bloomCols, bloomBits = bloomBits)
    publishFull(f, root, dataRel,
      manifestBody(dataRel, meta + ("partitionCol" -> partCol)))
  }

  /** [[commitAppend]] writing the shard hive-partitioned: one day's (or
    * tenant's) data lands as `<partCol>=<value>` subdirs of a fresh
    * manifest-appended dir — O(shard) commit into a partitioned table
    * of any size, the production ingest loop. */
  def commitAppendPartitioned(df: DataFrame, root: String, partCol: String,
      meta: Map[String, String] = Map.empty,
      statsCols: Seq[String] = Nil, bloomCols: Seq[String] = Nil,
      bloomBits: Int = 1 << 20): Long = {
    partitionCols(partCol).foreach { c =>
      require(df.schema.fieldNames.contains(c),
        s"partition column $c absent from the shard schema")
    }
    appendCore(df, root, statsCols, meta + ("partitionCol" -> partCol),
      dedupKey = None, partitionBy = Some(partCol),
      bloomCols = bloomCols, bloomBits = bloomBits)
      .getOrElse(sys.error("unreachable: dedup-free append cannot no-op"))
  }

  /** PARTITION-PRUNED read `partCol IN (values)` on the current
    * version: each partitioned snapshot dir contributes only its
    * matching `partCol=value` subdirectories — the scan opens
    * O(matching partitions), never O(table), straight off the
    * directory listing (Hive/Spark static partition pruning, served
    * through the Txn manifest). Flat dirs in a mixed chain are read
    * whole (one-sided: the trailing filter still applies), tombstones
    * fold in log order, and the final `where` keeps semantics ≡
    * `read(...).where(partCol isin values)` — the registered
    * txn_partitioned row hash-gates that equivalence. Values may be
    * any type whose toString matches the written directory names
    * (longs, plain strings); values Spark would ESCAPE in a dir name
    * (spaces, slashes) won't match the raw toString — keep partition
    * values URI-safe, which a sane layout does anyway. */
  def readPartitionPruned(spark: SparkSession, root: String,
      partCol: String, values: Seq[Any]): DataFrame = {
    require(values.nonEmpty, "readPartitionPruned needs at least one value")
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    // the shared recursive walk (r13): the directory rung drops
    // non-matching `partCol=value` subtrees AT WHATEVER LEVEL the
    // column lives, flat dirs in a mixed chain read whole (one-sided),
    // tombstones fold in log order — semantics ≡ read().where(isin),
    // same as before, now multi-level-aware
    val wanted = values.map(dirValue).toSet
    val (plan, _) = prunePlanBy(spark, root, v, _ => true,
      keepPart = (c, pv) => c != partCol || wanted(pv))
    scanPruned(spark, root, v, plan)
      .where(col(partCol).isin(values: _*))
  }

  /** The directory-level decision [[readPartitionPruned]] would make:
    * (kept, total) partition dirs across the version's partitioned
    * snapshot dirs — the measurable skipping claim. */
  def partitionProbe(spark: SparkSession, root: String, partCol: String,
      values: Seq[Any]): (Int, Int) = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val f = fs(spark, root)
    val wanted = values.map(dirValue).toSet
    var kept = 0
    var total = 0
    manifestDirs(f, root, v).map(parseEntry).foreach {
      case (dir, None) =>
        val abs = resolveDir(root, dir)
        if (isPartitionedDir(f, abs))
          // LEAF granularity (r13): single-level layouts count their
          // immediate subdirs exactly as before; multi-level layouts
          // count leaves, kept iff the probed column's level admits
          partitionLeafDirs(f, abs).foreach { case (_, parts) =>
            total += 1
            if (parts.forall { case (c, pv) => c != partCol || wanted(pv) })
              kept += 1
          }
      case _ => ()
    }
    (kept, total)
  }

  /** OPTIMISTIC-CONCURRENCY commit: publish `df` as the next version
    * only if the table is still at `expectedBase` (the version this
    * writer read before computing). A full-snapshot rewrite computed
    * from version B silently DISCARDS any version committed between B
    * and the publish — [[commit]]'s CAS only serializes version
    * numbers, it cannot know the rewrite is stale. This is the
    * serializable-writer check Delta calls conflict detection, reduced
    * to whole-snapshot granularity: losers throw
    * [[java.util.ConcurrentModificationException]] and must re-read +
    * recompute (their orphan snapshot is vacuum fodder, never visible).
    * The check runs AFTER the data write — the publish rename is the
    * linearization point, and a racer that lands between check and
    * rename is caught because rename-without-overwrite fails on the
    * taken version number and we re-check instead of retrying blindly. */
  def commitIf(df: DataFrame, root: String, expectedBase: Long,
      statsCols: Seq[String] = Nil, meta: Map[String, String] = Map.empty,
      partitionBy: Option[String] = None,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 20): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    def check(): Unit = {
      val cur = committedVersions(f, root).foldLeft(0L)(math.max)
      if (cur != expectedBase)
        throw new java.util.ConcurrentModificationException(
          s"table at $root moved to version $cur while this writer " +
            s"computed from $expectedBase; re-read and recompute")
    }
    check()
    val dataRel = writeSnapshot(df, root, statsCols, partitionBy,
      bloomCols, bloomBits)
    val tmp = stageManifest(f, root, dataRel.stripPrefix("data/"),
      manifestBody(dataRel, meta))
    try check()
    catch { case t: Throwable => f.delete(tmp, false); throw t }
    val target = new Path(s"$root/_commits/${expectedBase + 1}")
    val occLost = publishLock(root).synchronized {
      f.exists(target) || !f.rename(tmp, target)
    }
    if (occLost) {
      // a racer published expectedBase+1 between the re-check and the
      // rename; the rename-without-overwrite failure IS the detection
      // (staged manifest cleaned; the orphan snapshot is vacuum fodder)
      f.delete(tmp, false)
      throw new java.util.ConcurrentModificationException(
        s"version ${expectedBase + 1} at $root was taken concurrently; " +
          "re-read and recompute")
    }
    expectedBase + 1
  }

  /** ONE aggregation pass computing EVERY declared sidecar of a fresh
    * snapshot dir (r15, guide §1.2/§6 — r14 left this as its largest
    * unoptimized block): per-file min/max for numeric `statsCols`
    * (`_stats.tsv`, r8 format), lexicographic min/max for string stats
    * (`_stats_str.tsv`, r12), and one bloom per (file, bloom column)
    * (`_bloom.tsv`, r10) — previously one Spark job per sidecar KIND
    * plus one job PER bloom column over the same just-written snapshot,
    * now exactly one job per commit regardless of how many index
    * columns the table declares.
    *
    * Null semantics are preserved per format: min/max ignore nulls
    * natively (a null-only (file, col) cell writes the `-` sentinel —
    * never prunable); blooms skip nulls inside
    * [[graft.functions.BloomGramAggNullable]] and an all-null
    * (file, col) writes NO bloom line (its zero-bit buffer is
    * unambiguous: any real value sets K bits) — exactly the lines the
    * old `WHERE col IS NOT NULL` per-column jobs produced.
    * File-basename keyed: the manifest already pins the directory, so
    * the basename is unambiguous within a snapshot; hive-partitioned
    * snapshots (r11/r13) get one sidecar per LEAF `col=value` subdir
    * with the full chain captured by the pdir regex, so the metadata
    * read composes with directory pruning. */
  private def writeAllSidecars(spark: SparkSession, f: FileSystem,
      dataDir: String, statsCols: Seq[String], bloomCols: Seq[String],
      mBits: Int): Unit = {
    if (statsCols.isEmpty && bloomCols.isEmpty) return
    val snap = readDir(spark, f, dataDir)
    statsCols.foreach { c => require(snap.schema.fieldNames.contains(c),
      s"stats column $c absent from committed schema") }
    bloomCols.foreach { c => require(snap.schema.fieldNames.contains(c),
      s"bloom column $c absent from committed schema") }
    // numeric (long-castable) columns keep the r8 `_stats.tsv` format;
    // STRING columns (r12) write a parallel `_stats_str.tsv` with
    // URL-encoded lexicographic min/max — the categorical-filter
    // skipping text pipelines need (lang = 'en', source = 'web')
    // without touching the long sidecar's parsers
    val (strCols, numCols) = statsCols.partition(c =>
      snap.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val partitioned = isPartitionedDir(f, dataDir)
    val keys: Seq[org.apache.spark.sql.Column] =
      (if (partitioned)
        Seq(regexp_extract(input_file_name(),
          "/([^/]+=[^/]*(?:/[^/]+=[^/]*)*)/[^/]+$", 1).as("pdir"))
      else Seq.empty) :+
        regexp_extract(input_file_name(), "[^/]+$", 0).as("file")
    lazy val bloomAgg = udaf(new graft.functions.BloomGramAggNullable(mBits),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Long]]())
    val aggs: Seq[org.apache.spark.sql.Column] =
      numCols.flatMap(c => Seq(min(numFeed(snap, c)), max(numFeed(snap, c)))) ++
        strCols.flatMap(c => Seq(min(col(c)), max(col(c)))) ++
        bloomCols.map(c => bloomAgg(bloomFeed(snap, c)))
    val rows = snap.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
      .collect() // one row per data FILE — bounded by snapshot file count
    val kw = keys.size
    val strBase = kw + 2 * numCols.size
    val bloomBase = strBase + 2 * strCols.size
    def fmtLong(r: org.apache.spark.sql.Row, at: Int): String =
      if (r.isNullAt(at)) "-" else r.getLong(at).toString
    def fmtStr(r: org.apache.spark.sql.Row, at: Int): String =
      if (r.isNullAt(at)) "-" else encodeStatValue(r.getString(at))
    def encodeBits(r: org.apache.spark.sql.Row, at: Int): Option[String] = {
      val bits = r.getSeq[Long](at).toArray
      if (!bits.exists(_ != 0L)) None // all-null (file, col): no line
      else {
        val bytes = java.nio.ByteBuffer.allocate(bits.length * 8)
        bits.foreach(bytes.putLong)
        Some(java.util.Base64.getEncoder.encodeToString(bytes.array()))
      }
    }
    def emit(rel: String, name: String, body: String): Unit = {
      val p = new Path(if (rel.isEmpty) s"$dataDir/$name" else s"$dataDir/$rel/$name")
      val out = f.create(p, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
    }
    // an EMPTY flat snapshot still writes its (empty) stats sidecars —
    // the pre-r15 writers' behavior; partitioned dirs only ever wrote
    // sidecars into leaf dirs that produced rows
    val byDir: Seq[(String, Array[org.apache.spark.sql.Row])] =
      if (!partitioned) Seq(("", rows))
      else rows.groupBy(r => decodeUriChain(r.getString(0))).toSeq
    byDir.foreach { case (rel, rs) =>
      val fileAt = kw - 1
      if (numCols.nonEmpty) {
        val sb = new StringBuilder
        rs.foreach { r =>
          val file = decodeUriSegment(r.getString(fileAt))
          numCols.zipWithIndex.foreach { case (c, i) =>
            sb.append(s"$file\t$c\t${fmtLong(r, kw + 2 * i)}\t${fmtLong(r, kw + 2 * i + 1)}\n")
          }
        }
        emit(rel, "_stats.tsv", sb.toString)
      }
      if (strCols.nonEmpty) {
        val sb = new StringBuilder
        rs.foreach { r =>
          val file = decodeUriSegment(r.getString(fileAt))
          strCols.zipWithIndex.foreach { case (c, i) =>
            sb.append(s"$file\t$c\t${fmtStr(r, strBase + 2 * i)}\t${fmtStr(r, strBase + 2 * i + 1)}\n")
          }
        }
        emit(rel, "_stats_str.tsv", sb.toString)
      }
      if (bloomCols.nonEmpty) {
        val sb = new StringBuilder
        rs.foreach { r =>
          val file = decodeUriSegment(r.getString(fileAt))
          bloomCols.zipWithIndex.foreach { case (c, i) =>
            encodeBits(r, bloomBase + i).foreach(b64 =>
              sb.append(s"$file\t$c\t$b64\n"))
          }
        }
        // flat snapshots always created `_bloom.tsv` (possibly empty);
        // partitioned ones only where a non-null row contributed
        if (!partitioned || sb.nonEmpty) emit(rel, "_bloom.tsv", sb.toString)
      }
    }
  }

  /** TSV-safe encoding for string stat values: URL-encode (tabs and
    * newlines become %XX) and keep the null sentinel `-` unambiguous
    * (a literal "-" value encodes as %2D). */
  private def encodeStatValue(v: String): String = {
    val enc = java.net.URLEncoder.encode(v, "UTF-8")
    if (enc == "-") "%2D" else enc
  }
  private def decodeStatValue(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  /** (file-key, col) -> (min, max) merged from every snapshot dir's
    * stats sidecar; dirs committed without stats simply contribute
    * nothing, so their files are never prunable. File keys: plain
    * basename for flat dirs (globally unique — Spark part files embed a
    * write UUID), `subdir/basename` for hive-partitioned dirs (one
    * write task emits same-basename files into several partition
    * subdirs, so the subdir qualifies the key). */
  def fileStats(spark: SparkSession, root: String,
      version: Long): Map[(String, String), (Option[Long], Option[Long])] = {
    val f = fs(spark, root)
    manifestDirs(f, root, version)
      .filter(!_.startsWith("~")).flatMap { d =>
        statsSidecars(f, resolveDir(root, d)).flatMap { case (prefix, p) =>
          readLines(f, p).map { line =>
            val Array(file, c, mn, mx) = line.split('\t')
            def parse(s: String) = if (s == "-") None else Some(s.toLong)
            (s"$prefix$file", c) -> ((parse(mn), parse(mx)))
          }
        }
      }.toMap
  }

  /** The sidecar files named `name` under a snapshot dir with their
    * file-key prefixes: the dir-root sidecar (flat snapshots, prefix
    * "") plus one per LEAF partition subdir (prefix `chain/` — the full
    * `a=v/b=w/` relative path for multi-level layouts, r13). */
  private def sidecarsNamed(f: FileSystem, dir: String,
      name: String): Seq[(String, Path)] = {
    val flat = new Path(s"$dir/$name")
    val fromRoot = if (f.exists(flat)) Seq(("", flat)) else Seq.empty
    val fromParts =
      if (!isPartitionedDir(f, dir)) Seq.empty
      else partitionLeafDirs(f, dir).flatMap { case (rel, _) =>
        val p = new Path(s"$dir/$rel/$name")
        if (f.exists(p)) Seq((s"$rel/", p)) else Seq.empty
      }
    fromRoot ++ fromParts
  }

  private def statsSidecars(f: FileSystem, dir: String): Seq[(String, Path)] =
    sidecarsNamed(f, dir, "_stats.tsv")

  /** (file-key, col) -> lexicographic (min, max) from the STRING stats
    * sidecars (r12) — same merge/keying rules as [[fileStats]]; dirs
    * committed without string stats contribute nothing. */
  def fileStatsStr(spark: SparkSession, root: String, version: Long)
      : Map[(String, String), (Option[String], Option[String])] = {
    val f = fs(spark, root)
    manifestDirs(f, root, version)
      .filter(!_.startsWith("~")).flatMap { d =>
        sidecarsNamed(f, resolveDir(root, d), "_stats_str.tsv").flatMap {
          case (prefix, p) =>
            readLines(f, p).map { line =>
              val Array(file, c, mn, mx) = line.split('\t')
              def parse(s: String) =
                if (s == "-") None else Some(decodeStatValue(s))
              (s"$prefix$file", c) -> ((parse(mn), parse(mx)))
            }
        }
      }.toMap
  }

  private def readLines(f: FileSystem, p: Path): Seq[String] = {
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.split('\n').filter(_.nonEmpty).toSeq
  }

  /** Per-file BLOOM sidecar (r10): for each named LONG-castable column,
    * one fixed-size bloom filter per data file over that file's values,
    * stored as `_bloom.tsv` lines `basename TAB col TAB base64(bits)`
    * inside the snapshot dir (published atomically with the data, like
    * `_stats.tsv`). Built by the same mergeable
    * [[graft.functions.BloomGramAgg]] the decontamination path uses —
    * partial aggregation per input split, a bitwise-OR merge per file,
    * no shuffle wider than one fixed-size array per file. `mBits` is a
    * per-file constant: at the default 2^20 bits / K=7 a 128 KiB
    * sidecar per file holds ~100k keys under 1% FP; size it to the
    * file row count, not the table. Null values contribute nothing (a
    * null never matches a point probe). */
  /** The long a STRING value feeds its bloom as (r13): Spark's
    * xxhash64 at the default seed — computed identically by the
    * executor-side builder (`functions.xxhash64`) and the driver-side
    * probe, so string point lookups (doc IDs, URLs — the natural keys
    * of a 100 TB text corpus) get the same O(matching files) economics
    * long keys have. */
  private[graft] def bloomStringHash(v: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType)),
      42L) // Spark's functions.xxhash64 default seed
      .eval(null).asInstanceOf[Long]

  /** The numeric sidecar feed for a column (r13): DATE columns record
    * epoch DAYS via datediff — ANSI forbids a date→long cast, and days
    * is ALSO the Catalyst DATE-literal domain, so probes match the
    * sidecar exactly with no conversion loss; everything else keeps the
    * r10 cast('long') (TIMESTAMP = epoch seconds, see the floor-probe
    * conversion in GraftSkipping). */
  private def numFeed(snap: DataFrame, c: String): org.apache.spark.sql.Column =
    snap.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType =>
        datediff(col(c), lit("1970-01-01").cast("date")).cast("long")
      case _ => col(c).cast("long")
    }

  /** A bloom column's long feed: STRING columns hash (r13 — a cast
    * would drop every non-numeric value), everything else rides
    * [[numFeed]] (DATE = epoch days, r13; the rest the r10
    * cast('long')). Pre-r13 string "blooms" were cast-based: fully
    * non-numeric columns produced NO sidecar rows (always kept, safe);
    * a mixed numeric-string column's old sidecar would mislead the
    * hashing reader — re-commit or compact such tables to refresh. */
  private def bloomFeed(snap: DataFrame, c: String): org.apache.spark.sql.Column =
    if (snap.schema(c).dataType == org.apache.spark.sql.types.StringType)
      xxhash64(col(c))
    else numFeed(snap, c)

  /** (file-key, col) -> bloom bit array, merged from every snapshot
    * dir's `_bloom.tsv` sidecars (dir-root for flat snapshots,
    * per-partition-subdir with `subdir/basename` keys for partitioned
    * ones); dirs committed without blooms contribute nothing (their
    * files are never point-prunable). */
  def fileBlooms(spark: SparkSession, root: String,
      version: Long): Map[(String, String), Array[Long]] = {
    val f = fs(spark, root)
    manifestDirs(f, root, version)
      .filter(!_.startsWith("~")).flatMap { d =>
        sidecarsNamed(f, resolveDir(root, d), "_bloom.tsv").flatMap {
          case (prefix, p) =>
            readLines(f, p).map { line =>
              val Array(file, c, b64) = line.split('\t')
              val bytes = java.util.Base64.getDecoder.decode(b64)
              val bb = java.nio.ByteBuffer.wrap(bytes)
              val bits = new Array[Long](bytes.length / 8)
              var i = 0
              while (i < bits.length) { bits(i) = bb.getLong(); i += 1 }
              (s"$prefix$file", c) -> bits
            }
        }
      }.toMap
  }

  /** [[commit]] that also writes BLOOM sidecars: full-snapshot publish
    * with `_stats.tsv` for `statsCols` (range skipping) and
    * `_bloom.tsv` for `bloomCols` (point skipping via [[readPoint]]).
    * Sidecars cost one extra scan of the fresh snapshot each and are
    * invisible to plain parquet readers. */
  def commitIndexed(df: DataFrame, root: String, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 20,
      meta: Map[String, String] = Map.empty): Long = {
    require(bloomBits % 64 == 0 && bloomBits > 0,
      s"bloomBits must be a positive multiple of 64, got $bloomBits")
    val spark = df.sparkSession
    val f = fs(spark, root)
    val dataRel = writeSnapshot(df, root, statsCols,
      bloomCols = bloomCols, bloomBits = bloomBits)
    publishFull(f, root, dataRel, manifestBody(dataRel, meta))
  }

  /** CHECK-constrained commit (r10, Delta's table constraints): every
    * expression in `checks` must hold on EVERY row or nothing is
    * published — the snapshot is validated AS WRITTEN (read back from
    * the fresh dir, so what's checked is exactly what readers would
    * see) before the manifest rename, and a violation fails loud with
    * a sample of offending rows while the table stays at its previous
    * version (the orphan snapshot is vacuum fodder, never visible).
    * Validation costs one scan of the new snapshot — same bill as a
    * stats sidecar — and runs distributed (a count + limited sample,
    * no collect of the data). NOT NULL is just `col IS NOT NULL` as a
    * check. */
  def commitChecked(df: DataFrame, root: String, checks: Seq[String],
      statsCols: Seq[String] = Nil, meta: Map[String, String] = Map.empty): Long = {
    require(checks.nonEmpty, "commitChecked needs at least one check")
    val spark = df.sparkSession
    val f = fs(spark, root)
    val dataRel = writeSnapshot(df, root, statsCols)
    val snap = spark.read.parquet(s"$root/$dataRel")
    checks.foreach { c =>
      val bad = snap.where(!expr(c))
      val sample = bad.limit(3).collect()
      if (sample.nonEmpty)
        throw new IllegalStateException(
          s"constraint violated, commit aborted (table unchanged): CHECK ($c) " +
            s"fails on rows like ${sample.mkString("; ").take(500)}")
    }
    publishFull(f, root, dataRel, manifestBody(dataRel, meta))
  }

  /** Per-manifest-entry pruning decision for version `version`: each
    * data-dir entry resolves to its KEPT parquet files (those whose
    * recorded `colName` range may overlap [lo, hi] — no stats row or
    * null bounds means always kept: pruning must be an optimization,
    * never a filter), tombstone entries pass through for the reader's
    * log-order fold. Also returns the total data-file count. The
    * version is an explicit parameter so one resolve feeds both the
    * file list and the schema (r10 advice: resolving twice let a
    * concurrent commit mix two versions' views). */
  /** One file group of a pruned scan: `files` read together, plus the
    * partition (col, rawValue) chain they sit under when they come from
    * a hive-partitioned subdir (one pair per nesting level, r13) — the
    * scan reconstructs those columns from the values (the files
    * themselves don't store them). */
  private case class ScanGroup(files: Seq[String],
      parts: Seq[(String, String)])

  /** Shared file-skipping walk (r11: partition-aware — the r10 refusal
    * guard is gone): every data file in version `version` passes
    * through `keepFile` (keyed by basename for flat dirs,
    * `subdir/basename` inside partitioned dirs — matching the sidecar
    * keys); tombstone entries pass through for the reader's log-order
    * fold. Partitioned dirs additionally pass each `col=value` subdir
    * through `keepPart` FIRST — the directory rung — and only surviving
    * subdirs pay the file-rung listing, so a pruned read's metadata
    * cost is O(kept partitions), never O(table). Both predicates must
    * be one-sided: they may keep what the residual predicate rejects,
    * never drop a file/dir containing a matching row. */
  private def prunePlanBy(spark: SparkSession, root: String, version: Long,
      keepFile: String => Boolean,
      keepPart: (String, String) => Boolean = (_, _) => true):
      (Seq[Either[Seq[ScanGroup], (String, String)]], Int) = {
    val f = fs(spark, root)
    var total = 0
    def parquetFiles(dir: Path): Seq[String] =
      f.listStatus(dir).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
    def base(path: String): String = path.substring(path.lastIndexOf('/') + 1)
    val plan = manifestDirs(f, root, version).map(parseEntry).map {
      case (dir, None) =>
        val abs = resolveDir(root, dir)
        if (!isPartitionedDir(f, abs)) {
          val files = parquetFiles(new Path(abs))
          total += files.size
          Left(Seq(ScanGroup(files.filter(p => keepFile(base(p))), Nil)))
        } else {
          // recursive walk (r13, multi-level layouts): the directory
          // rung applies PER LEVEL — a dropped `col=value` subtree is
          // never listed below, so a two-level `year=…/source=…` table
          // pays O(kept year dirs) + O(kept source dirs) metadata, and
          // file keys inside a leaf carry the full relative chain
          def walk(p: Path, rel: String,
              parts: Seq[(String, String)]): Seq[ScanGroup] = {
            val children = f.listStatus(p).toSeq
              .filter(st => st.isDirectory && st.getPath.getName.contains("="))
            if (children.isEmpty) {
              val files = parquetFiles(p)
              total += files.size
              Seq(ScanGroup(
                files.filter(fp => keepFile(s"$rel${base(fp)}")), parts))
            } else children.flatMap { st =>
              val pdir = st.getPath.getName
              val eq = pdir.indexOf('=')
              val (c, v) = (pdir.substring(0, eq), pdir.substring(eq + 1))
              if (!keepPart(c, v)) Nil // directory rung: never listed
              else walk(st.getPath, s"$rel$pdir/", parts :+ ((c, v)))
            }
          }
          Left(walk(new Path(abs), "", Nil))
        }
      case (dir, Some(keyCol)) => Right((dir, keyCol))
    }
    (plan, total)
  }

  /** The min/max-stats keep decision for `lo <= col <= hi`: a file
    * survives unless its recorded range provably misses the interval
    * (no stats row or null bounds = always kept — pruning is an
    * optimization, never a filter). */
  private def statsKeep(stats: Map[(String, String), (Option[Long], Option[Long])],
      colName: String, lo: Long, hi: Long)(base: String): Boolean =
    stats.get((base, colName)) match {
      case Some((Some(mn), Some(mx))) => mx >= lo && mn <= hi
      case _                          => true
    }

  private def prunePlan(spark: SparkSession, root: String, version: Long,
      colName: String, lo: Long,
      hi: Long): (Seq[Either[Seq[ScanGroup], (String, String)]], Int) =
    prunePlanBy(spark, root, version,
      statsKeep(fileStats(spark, root, version), colName, lo, hi))

  /** The file-skipping decision for `lo <= col <= hi` on version
    * `version`: (data files to read, total data files). Tombstone key
    * dirs are not data files and appear in neither count; [[readPruned]]
    * folds their anti-joins over the pruned scan. */
  def pruneFiles(spark: SparkSession, root: String, version: Long,
      colName: String, lo: Long, hi: Long): (Seq[String], Int) = {
    val (plan, total) = prunePlan(spark, root, version, colName, lo, hi)
    (plan.collect { case Left(gs) => gs.flatMap(_.files) }.flatten, total)
  }

  /** [[pruneFiles]] against the current version (one resolve, then the
    * pinned path). */
  def pruneFiles(spark: SparkSession, root: String, colName: String,
      lo: Long, hi: Long): (Seq[String], Int) =
    pruneFiles(spark, root, currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root")), colName, lo, hi)

  /** Data-skipping read of `lo <= col <= hi` on the current version:
    * opens only the files [[pruneFiles]] keeps and applies the residual
    * predicate (file granularity is coarse; row-level filtering still
    * pushes into the parquet reader as usual). Semantically identical
    * to `read(...).where(col between lo and hi)` whenever the stats
    * sidecar is honest — TxnSpec pins that equivalence; the registered
    * `txn_skipping` row hash-gates it against DuckDB. On a clustered
    * commit (range-partitioned + sorted, e.g. [[compactCommit]] output
    * or `compactParquetZorder`) this is the 100 TB point-query path:
    * O(matching files), not O(table).
    *
    * Tombstoned versions (r10, closing the r9 "blunt refusal"): file
    * stats cannot see row deletions, but they don't need to — the
    * tombstone anti-joins fold over the PRUNED scan in log order, the
    * deletion-vector shape Delta uses (prune by stats, then filter
    * deleted rows). Pruning only drops files whose every row the
    * residual predicate would reject, and the anti-join only ever
    * REMOVES rows, so prune-then-delete ≡ delete-then-filter; one GDPR
    * erasure no longer disables the point-query path until compaction
    * (it costs one O(deleted-keys) anti-join per tombstone until then).
    * The version is resolved ONCE and pins file list, schema, and
    * tombstone fold alike. */
  def readPruned(spark: SparkSession, root: String, colName: String,
      lo: Long, hi: Long): DataFrame = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val (plan, _) = prunePlan(spark, root, v, colName, lo, hi)
    scanPruned(spark, root, v, plan)
      .where(col(colName).cast("long").between(lo, hi))
  }

  /** Assemble a pruned plan into a DataFrame: kept files scanned under
    * the VERSION's schema, tombstone anti-joins folded in log order.
    * The version's schema is imposed explicitly — footer merging over
    * the surviving files would let the file SUBSET decide which evolved
    * columns surface (a pruned read keeping only pre-evolution files
    * would drop the evolved column), breaking the ≡ read().where(...)
    * contract; with an explicit schema the parquet reader null-fills
    * per file instead (r9 review). */
  private def scanPruned(spark: SparkSession, root: String, version: Long,
      plan: Seq[Either[Seq[ScanGroup], (String, String)]]): DataFrame = {
    val schema = readVersion(spark, root, version).schema
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    def scan(g: ScanGroup): DataFrame = g match {
      case ScanGroup(files, _) if files.isEmpty => empty
      case ScanGroup(files, Nil) =>
        spark.read.schema(schema).parquet(files: _*)
      case ScanGroup(files, parts) =>
        // a partitioned subdir's files do not STORE the partition
        // columns — reconstruct each level from its directory value at
        // the version schema's type, then restore column order (this is
        // what made the r10 guard refuse partitioned dirs: an
        // explicit-schema scan would have null-filled them).
        // The raw directory values are hive-ESCAPED (r11 advice: Spark
        // writes 'a b' as 'a%20b' and null as the default-partition
        // sentinel) — unescape before casting, and surface the null
        // sentinel as an actual null literal.
        val partCols = parts.map(_._1)
        val fileSchema = org.apache.spark.sql.types.StructType(
          schema.fields.filterNot(f => partCols.contains(f.name)))
        parts.foldLeft(
          spark.read.schema(fileSchema).parquet(files: _*)) {
            case (df, (c, raw)) =>
              val pType = schema(c).dataType
              val value =
                if (raw == hiveDefaultPartition) lit(null).cast(pType)
                else lit(unescapePathName(raw)).cast(pType)
              df.withColumn(c, value)
          }
          .select(schema.fieldNames.map(col).toSeq: _*)
    }
    plan.foldLeft(Option.empty[DataFrame]) {
      case (acc, Left(groups)) =>
        // a fully-pruned dir still contributes an empty frame so a
        // following tombstone folds over SOMETHING (same semantics as
        // the r10 flat form)
        val nonEmpty = groups.map(scan).filter(_ ne empty)
        val d = if (nonEmpty.isEmpty) empty else nonEmpty.reduce(_.unionByName(_))
        Some(acc.fold(d)(_.unionByName(d)))
      case (acc, Right((dir, keyCol))) =>
        val cols = tombstoneCols(keyCol)
        val keys = spark.read.parquet(resolveDir(root, dir))
          .select(cols.map(col): _*).distinct()
        val base = acc.getOrElse(sys.error(
          s"tombstone $dir precedes any data dir at $root"))
        // restore column order after the USING anti-join (see the
        // readVersion fold — same reordering hazard)
        Some(base.join(keys, cols, "left_anti")
          .select(base.columns.map(col).toSeq: _*))
    }.getOrElse(empty)
  }

  /** POINT-LOOKUP read `col IN (values)` via the BLOOM sidecar (r10):
    * keeps only the files whose bloom filter may contain at least one
    * probe value (min/max stats, when also present, prune first). This
    * is the skipping story min/max CANNOT tell: on a table clustered by
    * some OTHER column (time, tenant, z-order on two dims), every
    * file's range over an unclustered high-cardinality key spans
    * ~everything — range stats keep 100% of files — while a bloom keeps
    * ~(matching files + FP%). Delta ships the same trade as its bloom
    * filter index. One-sided by construction (a bloom never rejects a
    * present key), so readPoint ≡ read().where(col.isin(values)) —
    * TxnSpec pins the equivalence and the registered txn_bloom_point
    * row hash-gates it; files without a bloom row are always read.
    * Tombstoned versions fold their anti-joins over the pruned scan
    * exactly like [[readPruned]]. */
  /** The stats-and-bloom keep decision for a point probe: a file
    * survives iff SOME probe value passes both its range stats and its
    * bloom (absent sidecar rows always keep — one-sided). */
  private def pointKeep(spark: SparkSession, root: String, version: Long,
      colName: String, values: Seq[Long]): String => Boolean = {
    val stats = fileStats(spark, root, version)
    val blooms = fileBlooms(spark, root, version)
    base => values.exists { value =>
      statsKeep(stats, colName, value, value)(base) &&
        (blooms.get((base, colName)) match {
          case Some(bits) => bloomMayContain(bits, value)
          case None       => true
        })
    }
  }

  def readPoint(spark: SparkSession, root: String, colName: String,
      values: Seq[Long]): DataFrame = {
    require(values.nonEmpty, "readPoint needs at least one probe value")
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val (plan, _) = prunePlanBy(spark, root, v,
      pointKeep(spark, root, v, colName, values))
    scanPruned(spark, root, v, plan)
      .where(col(colName).cast("long").isin(values: _*))
  }

  /** The file-count decision [[readPoint]] would make: (kept, total)
    * data files for probing `values` on `colName` — the measurable
    * skipping claim without executing the scan. */
  def probeFiles(spark: SparkSession, root: String, colName: String,
      values: Seq[Long]): (Int, Int) = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val (plan, total) = prunePlanBy(spark, root, v,
      pointKeep(spark, root, v, colName, values))
    (plan.collect { case Left(gs) => gs.map(_.files.size).sum }.sum, total)
  }

  /** STRING point-lookup read `col IN (values)` (r13): the
    * [[readPoint]] economics for STRING keys — doc IDs, URLs, content
    * hashes, the natural identifiers of a text corpus — via the
    * xxhash64-fed blooms and the `_stats_str.tsv` lexicographic
    * bounds. One-sided like every skipping read: ≡
    * `read().where(col isin values)`, files without sidecar rows are
    * always read; tombstones fold over the pruned scan. */
  def readPointString(spark: SparkSession, root: String, colName: String,
      values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "readPointString needs at least one probe value")
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val (plan, _) = prunePlanBy(spark, root, v,
      probesKeepFile(spark, root, v, Seq(StrPointProbe(colName, values))))
    scanPruned(spark, root, v, plan)
      .where(col(colName).isin(values: _*))
  }

  /** The file-count decision [[readPointString]] would make: (kept,
    * total) — the measurable string-bloom skipping claim. */
  def probeFilesString(spark: SparkSession, root: String, colName: String,
      values: Seq[String]): (Int, Int) = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val (plan, total) = prunePlanBy(spark, root, v,
      probesKeepFile(spark, root, v, Seq(StrPointProbe(colName, values))))
    (plan.collect { case Left(gs) => gs.map(_.files.size).sum }.sum, total)
  }

  /** TWO-RUNG pruned read on a hive-partitioned table (r11, closing the
    * r10 "partitioned dirs refuse file skipping" gap): directory
    * pruning (`partCol IN values` straight off the listing) composes
    * with file-stats skipping (`lo <= col <= hi` against the
    * per-partition `_stats.tsv` sidecars) and the residual filter;
    * tombstones fold over the pruned scan in log order. This is the
    * actual 100 TB point-query read path — partition → file → row: a
    * year-partitioned decade of data probed for one customer's January
    * opens one directory listing, then only the files whose stats admit
    * the key, then row-level parquet pushdown inside those. Semantics ≡
    * `read(...).where(partCol isin values && col between lo and hi)` —
    * TxnSpec pins the equivalence and the dirs/files counts. Flat dirs
    * in a mixed chain skip the directory rung (one-sided) but still
    * prune by stats. */
  def readPartitionFilePruned(spark: SparkSession, root: String,
      partCol: String, values: Seq[Any], colName: String, lo: Long,
      hi: Long): DataFrame = {
    require(values.nonEmpty, "readPartitionFilePruned needs at least one value")
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val wanted = values.map(dirValue).toSet
    val (plan, _) = prunePlanBy(spark, root, v,
      statsKeep(fileStats(spark, root, v), colName, lo, hi),
      keepPart = (c, pv) => c != partCol || wanted(pv))
    scanPruned(spark, root, v, plan)
      .where(col(partCol).isin(values: _*) &&
        col(colName).cast("long").between(lo, hi))
  }

  /** The decisions [[readPartitionFilePruned]] would make, without the
    * scan: (partition dirs kept, partition dirs total, files kept,
    * files in kept dirs) — the measurable two-rung skipping claim
    * (dirs_kept < dirs_total proves the directory rung fired AND
    * files_kept < files-in-kept-dirs proves the file rung fired on what
    * survived). */
  def partitionFileProbe(spark: SparkSession, root: String,
      partCol: String, values: Seq[Any], colName: String, lo: Long,
      hi: Long): (Int, Int, Int, Int) = {
    val v = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val f = fs(spark, root)
    val wanted = values.map(dirValue).toSet
    var dirsKept = 0
    var dirsTotal = 0
    manifestDirs(f, root, v).map(parseEntry).foreach {
      case (dir, None) =>
        val abs = resolveDir(root, dir)
        if (isPartitionedDir(f, abs))
          partitionLeafDirs(f, abs).foreach { case (_, parts) =>
            dirsTotal += 1
            if (parts.forall { case (c, pv) => c != partCol || wanted(pv) })
              dirsKept += 1
          }
      case _ => ()
    }
    val wantedVals = values.map(dirValue).toSet
    val (plan, totalInKept) = prunePlanBy(spark, root, v,
      statsKeep(fileStats(spark, root, v), colName, lo, hi),
      keepPart = (c, pv) => c != partCol || wantedVals(pv))
    val filesKept = plan.collect { case Left(gs) => gs.map(_.files.size).sum }.sum
    (dirsKept, dirsTotal, filesKept, totalInKept)
  }

  /** One-sided skipping probes the SQL read path derives from pushed
    * data-source filters (r12, r11 verdict item 1): each probe may only
    * ever KEEP extra files/dirs, never drop one holding a matching row,
    * so a conjunction of probes composes one-sided too. Ranges and
    * points consult the `_stats.tsv`/`_bloom.tsv` sidecars exactly like
    * [[readPruned]]/[[readPoint]]; partition probes ride the directory
    * listing like [[readPartitionPruned]]. */
  private[graft] sealed trait SkipProbe
  private[graft] final case class RangeProbe(col: String, lo: Long,
      hi: Long) extends SkipProbe
  private[graft] final case class PointProbe(col: String,
      values: Seq[Long]) extends SkipProbe
  private[graft] final case class PartProbe(col: String,
      values: Seq[Any]) extends SkipProbe
  /** String equality/IN probe against the `_stats_str.tsv` sidecars
    * (r12): a file survives iff SOME probe value falls inside its
    * lexicographic [min, max] — the categorical-column skipping rung
    * (lang = 'en' on a lang-clustered corpus). */
  private[graft] final case class StrPointProbe(col: String,
      values: Seq[String]) extends SkipProbe

  /** The conjunction keep-decision for a file key under `probes`:
    * ranges check min/max stats, points check stats AND blooms per
    * value (absent sidecar rows always keep), partition probes are
    * handled at the directory rung and keep every file here. */
  private def probesKeepFile(spark: SparkSession, root: String,
      version: Long, probes: Seq[SkipProbe]): String => Boolean = {
    val stats = fileStats(spark, root, version)
    lazy val blooms = fileBlooms(spark, root, version)
    lazy val strStats = fileStatsStr(spark, root, version)
    base => probes.forall {
      case RangeProbe(c, lo, hi) => statsKeep(stats, c, lo, hi)(base)
      case PointProbe(c, vs) => vs.exists { v =>
        statsKeep(stats, c, v, v)(base) &&
          (blooms.get((base, c)) match {
            case Some(bits) => bloomMayContain(bits, v)
            case None       => true
          })
      }
      case StrPointProbe(c, vs) =>
        val bloomKeep = blooms.get((base, c)) match {
          case Some(bits) =>
            // string blooms carry xxhash64 feeds (r13): a probe value
            // survives iff its hash may be present
            vs.exists(v => bloomMayContain(bits, bloomStringHash(v)))
          case None => true
        }
        bloomKeep && (strStats.get((base, c)) match {
        case Some((Some(mn), Some(mx))) =>
          // Compare in the WRITER's order: the sidecar min/max came from
          // Spark's min()/max() under UTF8String binary (UTF-8 byte)
          // ordering, which disagrees with Java String UTF-16 code-unit
          // order for [U+E000,U+FFFF] vs supplementary-plane chars — a
          // Java-order compare could drop a file containing the probed
          // value (r12 advice, medium).
          import org.apache.spark.unsafe.types.UTF8String
          val (bMn, bMx) = (UTF8String.fromString(mn), UTF8String.fromString(mx))
          vs.exists { v =>
            val b = UTF8String.fromString(v)
            b.compareTo(bMn) >= 0 && b.compareTo(bMx) <= 0
          }
        case _ => true // no stats row or null bounds: always read
      })
      case _: PartProbe => true
    }
  }

  /** Directory-rung keep-decision: a `col=value` subdir survives unless
    * SOME partition probe names its column and excludes its value
    * (probe values hive-escape before matching the raw listing). */
  private def probesKeepPart(
      probes: Seq[SkipProbe]): (String, String) => Boolean = {
    val parts = probes.collect {
      case PartProbe(c, vs) => c -> vs.map(dirValue).toSet
    }
    (c, pv) => parts.forall { case (pc, wanted) => c != pc || wanted(pv) }
  }

  /** Kept-file decision for the NATIVE SQL scan (flat-dir versions):
    * (kept file paths, kept count, total count). The caller hands the
    * kept paths straight to Spark's vectorized parquet table, so a SQL
    * point query on an indexed table opens O(matching files) — the
    * BLOOM/PARTSKIP economics, reachable from pasted SQL. */
  private[graft] def sqlKeptFiles(spark: SparkSession, root: String,
      version: Long,
      probes: Seq[SkipProbe]): (Seq[String], Int, Int) = {
    val (plan, total) = prunePlanBy(spark, root, version,
      probesKeepFile(spark, root, version, probes),
      probesKeepPart(probes))
    val kept = plan.collect { case Left(gs) => gs.flatMap(_.files) }.flatten
    (kept, kept.size, total)
  }

  /** Probe-pruned read for the SQL V1 bridge (tombstoned or partitioned
    * chains): partition probes prune directories off the listing, file
    * probes prune by sidecar stats/blooms, tombstone anti-joins fold
    * over the pruned scan in log order, and the partition column
    * reconstructs hive-unescaped. One-sided by construction — the
    * caller re-applies every pushed filter on top, so semantics stay
    * ≡ the unpruned read. Returns the frame plus the (kept, total)
    * file decision for observability. */
  private[graft] def readSqlPruned(spark: SparkSession, root: String,
      version: Long, probes: Seq[SkipProbe]): (DataFrame, Int, Int, Int, Int) = {
    // tally the directory rung by wrapping the keep predicate: total
    // files below only counts files in SURVIVING dirs (dropped dirs are
    // never listed — that unpaid listing IS the dir rung's win), so the
    // dir counts are the only observable trace of it
    var dirsTotal = 0
    var dirsKept = 0
    val kp = probesKeepPart(probes)
    val (plan, total) = prunePlanBy(spark, root, version,
      probesKeepFile(spark, root, version, probes),
      (c, v) => {
        dirsTotal += 1
        val k = kp(c, v)
        if (k) dirsKept += 1
        k
      })
    val kept = plan.collect { case Left(gs) => gs.map(_.files.size).sum }.sum
    (scanPruned(spark, root, version, plan), kept, total, dirsKept, dirsTotal)
  }

  private def bloomMayContain(bits: Array[Long], value: Long): Boolean = {
    val m = bits.length * 64
    var i = 0
    while (i < graft.functions.BloomHash.K) {
      val p = graft.functions.BloomHash.pos(value, i, m)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Total parquet bytes of version `n`'s data dirs (tombstone key dirs
    * excluded) — the [[tableDetail]] bytes gauge pinned at a version:
    * the SQL V1 bridge reports it as the scan's sizeInBytes so the
    * optimizer can cost (and broadcast) tombstoned/partitioned chains
    * (r13, r12 verdict item 2). O(files) driver-side listing, the same
    * bill the prune planner already pays. */
  private[graft] def versionBytes(spark: SparkSession, root: String,
      n: Long): Long = {
    val f = fs(spark, root)
    var bytes = 0L
    manifestDirs(f, root, n).map(parseEntry).foreach {
      case (_, Some(_)) => ()
      case (dir, None) =>
        val it = f.listFiles(new Path(resolveDir(root, dir)), true)
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet"))
            bytes += st.getLen
        }
    }
    bytes
  }

  /** DETERMINISTIC file-key enumeration of a version's data files (r13,
    * the initial-snapshot chunking substrate): manifest-entry order,
    * then sorted partition subdirs, then sorted file basenames — stable
    * across processes and replays because manifests are immutable and
    * names sort identically everywhere (listStatus order is NOT
    * guaranteed, hence the explicit sorts). Keys match the sidecar/
    * [[prunePlanBy]] convention: `basename` for flat dirs,
    * `subdir/basename` inside partitioned dirs. */
  private[graft] def snapshotFileKeys(spark: SparkSession, root: String,
      version: Long): Seq[String] =
    snapshotFileSizes(spark, root, version).map(_._1)

  /** The same deterministic enumeration with per-file BYTES — the
    * rate-limited streaming source's `maxBytesPerTrigger` cursor
    * (r13): one listing yields both the order and the budget data. */
  private[graft] def snapshotFileSizes(spark: SparkSession, root: String,
      version: Long): Seq[(String, Long)] = {
    val f = fs(spark, root)
    def names(dir: Path): Seq[(String, Long)] = f.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => (st.getPath.getName, st.getLen)).sortBy(_._1)
    manifestDirs(f, root, version).map(parseEntry).flatMap {
      case (dir, None) =>
        val abs = resolveDir(root, dir)
        if (!isPartitionedDir(f, abs)) names(new Path(abs))
        else partitionLeafDirs(f, abs).sortBy(_._1).flatMap {
          case (rel, _) =>
            names(new Path(s"$abs/$rel")).map { case (n, len) =>
              (s"$rel/$n", len)
            }
        }
      case _ => Seq.empty
    }
  }

  /** One CHUNK of a version's snapshot: exactly the rows of the data
    * files whose key is in `keys`, with every LATER tombstone's
    * anti-join folded (r13 — the rate-limited streaming source's
    * initial-snapshot batches). The union over a partition of the full
    * key list equals [[readVersion]] exactly: the tombstone fold
    * distributes over row unions (anti-join(A ∪ B, K) =
    * anti-join(A, K) ∪ anti-join(B, K)), and a tombstone only ever
    * applies to dirs BEFORE it in the manifest — both already the
    * [[scanPruned]] contract. */
  private[graft] def snapshotChunk(spark: SparkSession, root: String,
      version: Long, keys: Set[String]): DataFrame = {
    val (plan, _) = prunePlanBy(spark, root, version, keys.contains)
    scanPruned(spark, root, version, plan)
  }

  /** STREAMING-SOURCE batch (r12, r11 verdict item 4 — the feed behind
    * `spark.readStream.format("graft")`): rows added in versions
    * `(fromExclusive, toInclusive]`, each stamped `_commit_version`.
    * From offset 0 the batch is the INITIAL SNAPSHOT (tombstones
    * folded — the correct first image); afterwards each step must be a
    * pure manifest EXTENSION whose added entries are data dirs: the
    * rows stream at FILE level, O(appended data), no diff — the
    * commit-log shape Delta's streaming source serves. A rewrite,
    * restore, or tombstone step fails LOUD (Delta's "detected a data
    * update" contract): an append-only reader that silently skipped a
    * delete would drift from the table forever. Deterministic replay:
    * manifests are immutable, so re-reading any (a, b] range after a
    * crash reproduces the batch exactly — vacuum retention must exceed
    * the restart window, same as the CDC feed. */
  private[graft] def streamBatch(spark: SparkSession, root: String,
      fromExclusive: Long, toInclusive: Long): DataFrame = {
    val f = fs(spark, root)
    def withVer(df: DataFrame, v: Long): DataFrame =
      df.withColumn("_commit_version", lit(v))
    if (fromExclusive <= 0L) {
      withVer(readVersion(spark, root, toInclusive), toInclusive)
    } else {
      val steps = ((fromExclusive + 1) to toInclusive).flatMap { v =>
        val prev = manifestDirs(f, root, v - 1)
        val cur = manifestDirs(f, root, v)
        require(cur.take(prev.size) == prev,
          s"graft streaming source requires append-only commits; " +
            s"version $v at $root rewrote or restored the table — " +
            "restart the stream from a fresh checkpoint to re-snapshot")
        val added = cur.drop(prev.size)
        require(added.forall(!_.startsWith("~")),
          s"graft streaming source: version $v at $root deleted rows " +
            "(tombstone entry); the source serves append-only feeds")
        added.map(d => readDir(spark, f, resolveDir(root, d)))
          .reduceOption(_.unionByName(_, allowMissingColumns = true))
          .map(withVer(_, v))
      }
      steps.reduceOption(_.unionByName(_, allowMissingColumns = true))
        .getOrElse(withVer(
          readVersion(spark, root, toInclusive).limit(0), toInclusive))
    }
  }

  /** Row-level CHANGES FEED between versions (CDC): for each step
    * v in (fromExclusive, toInclusive], rows present in v but not v-1
    * are emitted as `insert`@v and rows present in v-1 but not v as
    * `delete`@v — an update is its delete+insert pair, an untouched row
    * appears in no step. Two cost regimes per step (r9): an APPEND
    * version ([[commitAppend]] — its manifest extends the previous dir
    * list) takes the file-level fast path — the added dirs read
    * directly as inserts, O(appended data), no diff, exactly the
    * commit-log CDC the production formats serve; a full-snapshot
    * rewrite falls back to two `exceptAll`s (one hash exchange each,
    * keyed on the full row — bag semantics, duplicate multiplicity
    * respected), one linear pass per step, no quadratic term. Rewrites
    * that ADD or DROP nullable columns diff null-filled across the
    * boundary (r10); only a column changing TYPE still fails loud. */
  def changes(spark: SparkSession, root: String, fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    require(fromExclusive < toInclusive,
      s"empty changes range ($fromExclusive, $toInclusive]")
    val f = fs(spark, root)
    val steps = ((fromExclusive + 1) to toInclusive).map { v =>
      val prevDirs = manifestDirs(f, root, v - 1)
      val curDirs = manifestDirs(f, root, v)
      if (curDirs.startsWith(prevDirs) &&
          !hasTombstones(curDirs.drop(prevDirs.size))) {
        // FILE-LEVEL FAST PATH: version v is an append — its manifest
        // extends v-1's dir list, so the change set is exactly the
        // added dirs read as inserts. O(appended data), no exceptAll,
        // no scan of the base — the production formats' commit-log CDC.
        // An identical dir list (a no-op rewrite, legal) is an empty
        // step, not a zero-path read (r9 review).
        val added = curDirs.drop(prevDirs.size).map(d => resolveDir(root, d))
        val step =
          if (added.isEmpty) readVersion(spark, root, v).limit(0)
          else if (added.size == 1) spark.read.parquet(added.head)
          else spark.read.option("mergeSchema", "true").parquet(added: _*)
        step.withColumn("change_op", lit("insert"))
          .withColumn("change_version", lit(v))
      } else {
        val prev = readVersion(spark, root, v - 1)
        val cur = readVersion(spark, root, v)
        // SCHEMA-EVOLVING REWRITES (r10, closing the r9 fail-loud): a
        // rewrite may add or drop nullable columns; diff on the UNION
        // of the two schemas with the missing side null-filled — the
        // same contract readVersion's mergeSchema already gives
        // appends. A carried-over row whose added column is null
        // compares equal to its null-filled prior self and emits no
        // change; a backfilled value emits the delete+insert pair. A
        // column changing TYPE stays fail-loud (that genuinely needs
        // reader versioning, not a silent cast).
        val curFields = cur.schema.fields
        val prevFields = prev.schema.fields
        prevFields.foreach { pf =>
          curFields.find(_.name == pf.name).foreach { cf =>
            // same-chain WIDENING across versions diffs in the wider
            // domain (r13, ALTER COLUMN TYPE — lossless, so a carried
            // row compares equal to its widened self and emits no
            // change); any other type change stays fail-loud
            require(cf.dataType == pf.dataType ||
              sameWideningChain(pf.dataType, cf.dataType),
              s"column ${pf.name} changed type between versions ${v - 1} " +
                s"and $v at $root (${pf.dataType} -> ${cf.dataType}); " +
                "CDC across a type change requires reader versioning")
          }
        }
        val allFields =
          (curFields ++ prevFields.filterNot(pf =>
            curFields.exists(_.name == pf.name))).map { fl =>
            prevFields.find(_.name == fl.name) match {
              case Some(pf) if sameWideningChain(pf.dataType, fl.dataType) =>
                fl.copy(dataType = widerType(pf.dataType, fl.dataType))
              case _ => fl
            }
          }
        def align(df: DataFrame): DataFrame =
          df.select(allFields.toSeq.map { fl =>
            if (df.columns.contains(fl.name))
              col(fl.name).cast(fl.dataType).as(fl.name)
            else lit(null).cast(fl.dataType).as(fl.name)
          }: _*)
        val (pa, ca) = (align(prev), align(cur))
        ca.exceptAll(pa)
          .withColumn("change_op", lit("insert")).withColumn("change_version", lit(v))
          .unionByName(
            pa.exceptAll(ca)
              .withColumn("change_op", lit("delete"))
              .withColumn("change_version", lit(v)))
      }
    }
    // allowMissingColumns: an appended shard may carry columns other
    // steps lack (supported schema evolution) — null-fill across steps
    // instead of dying on the union (r9 review)
    steps.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Default vacuum retention: unreferenced artifacts younger than this
    * are presumed to belong to an IN-FLIGHT writer and survive the GC
    * (Delta's `delta.deletedFileRetentionDuration` role). */
  val DefaultVacuumRetentionMs: Long = 24L * 60 * 60 * 1000

  /** Drop snapshots and staged manifests no committed version (among
    * the retained `keepLast`) references, and the manifests of dropped
    * versions — the GC that bounds storage once readers of old
    * snapshots have drained.
    *
    * Retention guard (r10 advice): an unreferenced `data/` dir or
    * `_tmp/` manifest is NOT necessarily garbage — a concurrent writer
    * stages both BEFORE its publish rename, so deleting them wholesale
    * could yank data out from under a commit that then wins its rename
    * (the committed version would point at deleted files: the torn
    * table the protocol exists to prevent). Like Delta's VACUUM, only
    * artifacts whose modification time is older than `retentionMs` are
    * deleted; set it to 0 only when no writer can be in flight (e.g.
    * tests, or a single-writer maintenance window). Readers of dropped
    * VERSIONS still need to have drained — that part is inherently a
    * retention policy, not detectable from the log. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int = 1,
      retentionMs: Long = DefaultVacuumRetentionMs): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    require(retentionMs >= 0, s"retentionMs must be >= 0, got $retentionMs")
    val f = fs(spark, root)
    val cutoff = System.currentTimeMillis() - retentionMs
    val versions = committedVersions(f, root).sorted
    val keep = versions.takeRight(keepLast)
    val keepDirs = keep.flatMap(n =>
      manifestDirs(f, root, n).map(e => parseEntry(e)._1)).toSet
    versions.dropRight(keepLast)
      .foreach(n => f.delete(new Path(s"$root/_commits/$n"), false))
    val dataRoot = new Path(s"$root/data")
    if (f.exists(dataRoot)) f.listStatus(dataRoot).foreach { st =>
      if (!keepDirs.contains(s"data/${st.getPath.getName}") &&
          st.getModificationTime < cutoff)
        f.delete(st.getPath, true)
    }
    val tmpRoot = new Path(s"$root/_tmp")
    if (f.exists(tmpRoot)) {
      // per-entry, age-gated — never the wholesale directory delete: a
      // writer's freshly-staged manifest must survive until its rename
      f.listStatus(tmpRoot).foreach { st =>
        if (st.getModificationTime < cutoff) f.delete(st.getPath, true)
      }
      if (f.listStatus(tmpRoot).isEmpty) f.delete(tmpRoot, false)
    }
  }

  /** AUTO-COMPACTION policy actuator (r11, r10 verdict item 6): read
    * the [[tableDetail]] gauge and, when the file count or the
    * tombstone-chain depth crosses its conf threshold, compact the
    * table — one full commit of the folded current snapshot
    * repartitioned to the target file size, which merges small ingest
    * shards AND collapses the tombstone/upsert chain (every read was
    * paying one anti-join per tombstone until now). The production
    * loop is: ingest O(shard) appends + O(keys) deletes all day, call
    * maintain() on a schedule, and reads stay flat.
    *
    * Thresholds (session conf):
    *   - `spark.graft.txn.maintain.maxFiles`      (default 64)
    *   - `spark.graft.txn.maintain.maxTombstones` (default 8)
    *   - `spark.graft.txn.maintain.targetBytes`   (default 128 MiB)
    *
    * CONCURRENCY: the compaction publishes through [[commitIf]] pinned
    * to the version the gauge read — a maintenance job must NEVER
    * clobber a writer that landed mid-rewrite (a full-snapshot commit
    * from a stale base silently discards the racer's rows). A lost
    * race returns None (maintenance is best-effort; the next scheduled
    * tick re-reads the gauge and retries). `statsCols`/`bloomCols`
    * re-derive the skipping sidecars on the compacted layout, where
    * they are tighter than before. Returns Some(version) when a
    * compaction landed, None when the gauge is below thresholds or the
    * OCC publish lost. */
  def maintain(spark: SparkSession, root: String,
      statsCols: Seq[String] = Nil): Option[Long] = {
    def confLong(k: String, d: Long): Long =
      spark.conf.getOption(k).map(_.toLong).getOrElse(d)
    val maxFiles = confLong("spark.graft.txn.maintain.maxFiles", 64L)
    val maxTombs = confLong("spark.graft.txn.maintain.maxTombstones", 8L)
    val targetBytes = confLong("spark.graft.txn.maintain.targetBytes", 128L << 20)
    require(maxFiles > 0 && maxTombs >= 0 && targetBytes > 0,
      s"maintain thresholds must be positive ($maxFiles, $maxTombs, $targetBytes)")
    val base = currentVersion(spark, root).getOrElse(
      sys.error(s"no committed version at $root"))
    val (_, files, bytes, tombs) = tableDetail(spark, root)
    if (files <= maxFiles && tombs <= maxTombs) None
    else {
      // a hive-partitioned table keeps its layout through maintenance:
      // detection is STRUCTURAL (the layout is self-describing — a
      // tip whose last commit was a delete carries no partitionCol
      // meta, but its data dirs still do); the rewrite re-partitions
      // keyed by the partition column — each task owns whole
      // partitions, one file per col=value dir — instead of
      // flattening the table into an unpartitioned snapshot
      val f = fs(spark, root)
      // the full partition-column CHAIN (r13: a=v/b=w nests keep both)
      val partCol = manifestDirs(f, root, base).map(parseEntry)
        .collectFirst { case (dir, None)
            if isPartitionedDir(f, resolveDir(root, dir)) =>
          partitionLeafDirs(f, resolveDir(root, dir))
            .head._2.map(_._1).mkString(",")
        }
      val nFiles = math.max(1L, math.ceil(bytes.toDouble / targetBytes).toLong)
      val folded = readVersion(spark, root, base)
      val laid = partCol match {
        case Some(c) => folded.repartition(partitionCols(c).map(col): _*)
        case None    => folded.repartition(nFiles.toInt)
      }
      try Some(commitIf(laid, root, expectedBase = base,
        statsCols = statsCols,
        meta = Map("op" -> "maintain",
          "compactedFiles" -> files.toString,
          "collapsedTombstones" -> tombs.toString) ++
          partCol.map("partitionCol" -> _),
        partitionBy = partCol))
      catch {
        case _: java.util.ConcurrentModificationException => None
      }
    }
  }

  /** Transactional compaction: [[Layout.compactParquet]]'s rewrite,
    * committed as a new version of `root` instead of overwriting in
    * place — the compacted layout becomes visible atomically, and a
    * reader mid-query on the fragmented snapshot keeps it. Returns
    * (version, output file count).
    *
    * Index lifecycle (r10): compaction is also what collapses a
    * tombstone/upsert chain back to one clean dir — but a compacted
    * snapshot committed WITHOUT its skipping sidecars silently turns
    * the 100 TB point-query path back into a full scan. `statsCols` /
    * `bloomCols` re-derive `_stats.tsv` / `_bloom.tsv` on the
    * compacted layout (where they are TIGHTER than before: fewer,
    * larger, better-clustered files). */
  def compactCommit(spark: SparkSession, inDir: String, root: String,
      targetBytes: Long, statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil, bloomBits: Int = 1 << 20): (Long, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val in = new Path(inDir)
    val f = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var total = 0L
    val it = f.listFiles(in, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) total += st.getLen
    }
    val nFiles = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val v = commitIndexed(spark.read.parquet(inDir).repartition(nFiles),
      root, statsCols = statsCols, bloomCols = bloomCols,
      bloomBits = bloomBits)
    val dataDir = s"$root/${manifestTarget(fs(spark, root), root, v)}"
    val outCount = f.listStatus(new Path(dataDir))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (v, outCount)
  }
}
