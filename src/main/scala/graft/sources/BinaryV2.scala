package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.sources.{And, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Or}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The [[VcfBgzfSource]] pushdown contract applied to the BINARY
  * containers: DSv2 relations over sorted BCF ([[BcfBgzfSource]],
  * `Bcf.readTable`) and BAM ([[BamBgzfSource]], `Bam.readTable`) whose
  * `SupportsPushDownFilters` routes a chrom/rname equality (or IN)
  * plus pos bounds into the SAME per-file record-alignment bisection
  * `readRegion` plans ([[Bcf.regionPlan]]/[[Bam.regionPlan]], maxSpan
  * 0 — the predicate is on pos itself). Every filter is retained for
  * Spark to re-apply above the scan, so pruning only skips bytes.
  * [[Vcf.readAuto]]'s `.bcf` branch returns the BCF relation, so the
  * CLI's SQL-shaped access prunes with no API change; `Bam.readTable`
  * wraps the base relation in [[Sam.decorate]] — the decoration is a
  * deterministic projection, so Catalyst pushes rname/pos filters
  * straight through it into the scan.
  *
  * The partition readers decode through the exact splitRangeRecords
  * machinery the splittable readers use (same alignment guard), then
  * convert records to InternalRows under
  * `SupportsPushDownRequiredColumns` pruning. Row parity with
  * readSplit is spec-pinned (BinaryV2Spec) and gate-pinned against the
  * independent DuckDB text parses (g59b/g59c).
  */
private[sources] object BgzfPush {

  /** One prunable disjunct over (chrom, pos): an optional chrom set
    * plus inclusive pos bounds. `chroms = None` means "any chrom" —
    * unusable for windowing (the bisection key needs a contig rank).
    */
  private[sources] case class Conj(chroms: Option[Set[String]],
                                   lo: Long, hi: Long) {
    def staticallyEmpty: Boolean = lo > hi || chroms.exists(_.isEmpty)
  }
  private[sources] val All: Conj = Conj(None, Long.MinValue, Long.MaxValue)

  /** Extraction result. `regions = None`: the filters can't prune (no
    * usable chrom conjunct, or a disjunct without one) — full scan.
    * `Some(Nil)`: the recognized conjuncts are statically contradictory
    * — zero partitions (safe: a narrower true predicate can only be
    * emptier). `Some(rs)`: the (chrom, lo, hi) region list the
    * bisection planner takes. `used` lists the filters that contributed
    * a recognized conjunct — informational only, since EVERY filter is
    * always retained as residual and re-applied above the scan.
    */
  case class Extracted(regions: Option[Seq[(String, Long, Long)]],
                       used: Array[Filter])

  val Unextracted: Extracted = Extracted(None, Array.empty)

  /** Extract the prunable predicates over (`chromCol`, `posCol`) —
    * shared by all three container ScanBuilders. Handles both the
    * conjunct shape (`chrom='17' AND pos BETWEEN a AND b`) and the
    * panel shape a BED target list compiles to in SQL
    * (`(chrom='1' AND pos BETWEEN …) OR (chrom='2' AND …)`): the whole
    * filter conjunction is expanded to a BOUNDED DNF (≤64 disjuncts —
    * past that, top-level conjuncts only), each disjunct folds its
    * recognized leaves into a [[Conj]] (unrecognized leaves are ignored
    * — they only narrow rows, so the window stays a superset), and a
    * disjunct with no chrom constraint makes the whole extraction
    * unusable (its matching rows could be anywhere).
    *
    * Bound arithmetic SATURATES: pos is LongType (the text parse admits
    * 18 digits), so `pos > Long.MaxValue`-class predicates clamp
    * instead of wrapping, and a pushed lower bound above the int32
    * window cap falls through to the planner's own clamp (which keys
    * every over-cap position at the cap) rather than reading as
    * statically empty — the r15 int32 `hi` init silently dropped
    * `pos > 2^31-1` rows by planning zero partitions.
    */
  def extract(filters: Array[Filter], chromCol: String,
              posCol: String): Extracted = {
    def satInc(v: Long): Long = if (v == Long.MaxValue) v else v + 1
    def satDec(v: Long): Long = if (v == Long.MinValue) v else v - 1
    def fold(c: Conj, f: Filter): Option[Conj] = f match {
      case EqualTo(`chromCol`, s: String) =>
        Some(c.copy(chroms = Some(c.chroms.fold(Set(s))(_ & Set(s)))))
      case EqualNullSafe(`chromCol`, s: String) =>
        Some(c.copy(chroms = Some(c.chroms.fold(Set(s))(_ & Set(s)))))
      case In(`chromCol`, vs) if vs != null && vs.nonEmpty &&
        vs.forall(_.isInstanceOf[String]) =>
        val set = vs.map(_.asInstanceOf[String]).toSet
        Some(c.copy(chroms = Some(c.chroms.fold(set)(_ & set))))
      case EqualTo(`posCol`, v: Long) =>
        Some(c.copy(lo = math.max(c.lo, v), hi = math.min(c.hi, v)))
      case EqualNullSafe(`posCol`, v: Long) =>
        Some(c.copy(lo = math.max(c.lo, v), hi = math.min(c.hi, v)))
      case In(`posCol`, vs) if vs != null && vs.nonEmpty &&
        vs.forall(_.isInstanceOf[Long]) =>
        // conjunct-fold view of a position list: its [min, max] hull
        // (the dnf path below expands small lists to one disjunct per
        // value instead — one tiny window per looked-up position)
        val ls = vs.map(_.asInstanceOf[Long])
        Some(c.copy(lo = math.max(c.lo, ls.min),
          hi = math.min(c.hi, ls.max)))
      case GreaterThanOrEqual(`posCol`, v: Long) =>
        Some(c.copy(lo = math.max(c.lo, v)))
      case GreaterThan(`posCol`, v: Long) =>
        Some(c.copy(lo = math.max(c.lo, satInc(v))))
      case LessThanOrEqual(`posCol`, v: Long) =>
        Some(c.copy(hi = math.min(c.hi, v)))
      case LessThan(`posCol`, v: Long) =>
        Some(c.copy(hi = math.min(c.hi, satDec(v))))
      case _ => None
    }
    val maxDisjuncts = 64
    def dnf(f: Filter): Option[Seq[Seq[Filter]]] = f match {
      case And(l, r) =>
        for { a <- dnf(l); b <- dnf(r)
              if a.size.toLong * b.size <= maxDisjuncts }
          yield for { x <- a; y <- b } yield x ++ y
      case Or(l, r) =>
        for { a <- dnf(l); b <- dnf(r)
              if a.size + b.size <= maxDisjuncts } yield a ++ b
      case In(`posCol`, vs) if vs != null && vs.nonEmpty &&
        vs.length <= maxDisjuncts &&
        vs.forall(_.isInstanceOf[Long]) =>
        // a position LIST (the "annotate these N hits" lookup) expands
        // exactly to one disjunct per value — one bisected window per
        // position instead of the [min, max] hull spanning the chrom
        Some(vs.toSeq.map(v => Seq(EqualTo(posCol, v): Filter)))
      case leaf => Some(Seq(Seq(leaf)))
    }
    def hasRecognized(f: Filter): Boolean = f match {
      case And(l, r) => hasRecognized(l) || hasRecognized(r)
      case Or(l, r) => hasRecognized(l) || hasRecognized(r)
      case leaf => fold(All, leaf).isDefined
    }
    val disjuncts: Seq[Conj] =
      filters.foldLeft(Option(Seq(Seq.empty[Filter]))) { (acc, f) =>
        for { a <- acc; d <- dnf(f)
              if a.size.toLong * d.size <= maxDisjuncts }
          yield for { x <- a; y <- d } yield x ++ y
      } match {
        case Some(leafConjs) => leafConjs.map(leaves =>
          leaves.foldLeft(All)((c, lf) => fold(c, lf).getOrElse(c)))
        case None =>
          // DNF bound exceeded: top-level conjuncts only (an Or-shaped
          // filter is unrecognized here and simply doesn't narrow)
          Seq(filters.foldLeft(All)((c, f) => fold(c, f).getOrElse(c)))
      }
    val live = disjuncts.filterNot(_.staticallyEmpty)
    val regions: Option[Seq[(String, Long, Long)]] =
      if (live.isEmpty) Some(Nil) // every disjunct contradictory
      else if (live.forall(_.chroms.isDefined))
        Some(live.flatMap(c =>
          c.chroms.get.toSeq.sorted.map(ch => (ch, c.lo, c.hi))))
      else None
    Extracted(regions,
      if (regions.isDefined) filters.filter(hasRecognized)
      else Array.empty)
  }

  /** Driver-side registry carrying a PRE-PLANNED window list into a
    * DSv2 scan — the piece that lets `readRegion`/`readRegions`/
    * `readPanel` route through the relations (and so through
    * `SupportsPushDownRequiredColumns`: a panel read that only
    * aggregates `pos` must not split 20 genotype columns per line —
    * the r16 bench's 20× vsqx-vs-vpnx gap). The region APIs already
    * run the bisection themselves (any region count, maxSpan overlap
    * back-off, mixed-layout fallback — none of which the pushed-filter
    * DNF route can express), so they register the finished plan here
    * and hand the scan only the key via the `windowPlan` option:
    * windows are metadata-scale but can number files×regions, too big
    * for an option string, and `planInputPartitions` runs on the
    * driver anyway. Access-ordered LRU bounded at 1024 live plans — a
    * plan is re-touched on every re-plan of its DataFrame, so eviction
    * hits abandoned frames first; touching an EVICTED plan (>1024
    * region frames later) is a loud error, never a silent full scan.
    */
  private val MaxWindowPlans = 1024
  private val windowPlans = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Seq[Bgzf.FileWindow]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Seq[Bgzf.FileWindow]]): Boolean =
        size > MaxWindowPlans
    })

  def registerWindows(windows: Seq[Bgzf.FileWindow]): String = {
    val id = java.util.UUID.randomUUID().toString
    windowPlans.put(id, windows)
    id
  }

  def windowPlan(id: String): Seq[Bgzf.FileWindow] = {
    val ws = windowPlans.get(id)
    require(ws != null,
      s"window plan $id is gone — region-read plans are driver-session" +
        s"-scoped (LRU, $MaxWindowPlans live); re-run the readRegion/" +
        "readRegions/readPanel call instead of reusing its DataFrame " +
        "across sessions")
    ws
  }

  /** Extract the chrom value set from RUNTIME filter predicates (the
    * `SupportsRuntimeV2Filtering.filter` input): a broadcast join
    * `containerRelation ⋈ small panel ON chrom` hands the scan the
    * build side's DISTINCT key set as an IN predicate
    * (`DataSourceV2Strategy.translateRuntimeFilterV2` emits
    * `Predicate("IN", FieldReference(col) +: LiteralValues)`), so the
    * scan can re-plan to just those chromosomes' byte windows — the
    * join-shaped twin of a literal `WHERE chrom IN (…)`. Unrecognized
    * predicate shapes are IGNORED (no restriction — runtime filters
    * only ever narrow, so ignoring one is just a full scan, never a
    * wrong row). Null values never equality-join, so they drop from
    * the set. Multiple predicates on the column intersect.
    */
  def runtimeChromSet(predicates: Array[Predicate],
                      chromCol: String): Option[Set[String]] = {
    var out: Option[Set[String]] = None
    predicates.foreach { p =>
      val ch = p.children()
      if (p.name() == "IN" && ch.nonEmpty) {
        val colOk = ch(0) match {
          case r: NamedReference => r.fieldNames.toSeq == Seq(chromCol)
          case _ => false
        }
        if (colOk && ch.tail.forall(_.isInstanceOf[Literal[_]])) {
          val vs = ch.tail.collect {
            case l: Literal[_] if l.value != null => l.value.toString
          }.toSet
          out = Some(out.fold(vs)(_ & vs))
        }
      }
    }
    out
  }

  /** Fold a runtime chrom set into the pushed-filter extraction: with
    * literal regions, keep only the disjuncts whose chrom survives;
    * with none, the set alone becomes whole-chromosome regions (pos
    * unbounded — the planner's int32 clamp bounds the key). The
    * result re-plans to the runtime keys' windows only.
    */
  def applyRuntime(e: Extracted,
                   chroms: Option[Set[String]]): Extracted =
    chroms match {
      case None => e
      case Some(set) => e.regions match {
        case Some(rs) => e.copy(regions = Some(rs.filter(r => set(r._1))))
        case None => e.copy(regions =
          Some(set.toSeq.sorted.map(c => (c, 0L, Long.MaxValue))))
      }
    }

  /** Tile planned windows into byte-range partitions. */
  def tile(windows: Seq[Bgzf.FileWindow],
           splitSize: Long): Array[InputPartition] =
    windows.filter(w => w.toByte > w.fromByte).flatMap { w =>
      val span = w.toByte - w.fromByte
      val n = math.max(1L, (span + splitSize - 1) / splitSize)
      (0L until n).map(i => BgzfScanPartition(w.path,
        w.fromByte + i * splitSize,
        math.min(w.fromByte + (i + 1) * splitSize, w.toByte),
        w.fileLen))
    }.toArray

  /** Windows (or whole files when no disjunct is usable) tiled into
    * partitions — the shared planInputPartitions body of the binary
    * relations (the VCF relation adds its BGZF-only require on the
    * full-scan-fallback class in [[VcfBgzfScan]]). A planner that
    * emits fullScan files (the Bcf/Bam planners never do — their
    * contig dictionaries are closed) gets them tiled WHOLE-FILE here,
    * so no future caller can silently lose their rows through this
    * shared helper.
    */
  def plan(spark: SparkSession, path: String, splitSize: Long,
           e: Extracted,
           regionPlan: Seq[(String, Long, Long)] => Vcf.RegionPlan)
    : Array[InputPartition] = {
    val windows = e.regions match {
      case Some(rs) if rs.isEmpty =>
        Seq.empty // statically contradictory filters
      case Some(rs) =>
        val p = regionPlan(rs)
        p.windows ++ p.fullScan.map(f =>
          Bgzf.FileWindow(f.path, f.len, 0L, f.len, 0))
      case None => Bgzf.resolveFiles(spark, path).map { case (fp, len) =>
        Bgzf.FileWindow(fp, len, 0L, len, 0)
      }
    }
    tile(windows, splitSize)
  }

  def describe(name: String, path: String, e: Extracted,
               windowPlanId: Option[String] = None): String =
    windowPlanId match {
      case Some(id) =>
        s"$name $path (pre-planned windows: " +
          s"${windowPlans.get(id) match {
            case null => "expired"
            case ws => s"${ws.count(w => w.toByte > w.fromByte)}"
          }})"
      case None if e.used.isEmpty => s"$name $path (full scan)"
      case None =>
        s"$name $path (PushedFilters: [${e.used.mkString(", ")}], " +
          s"regions=${e.regions.map(_.map { case (c, l, h) =>
            s"$c:[$l,$h]" }.mkString("|")).getOrElse("*")})"
    }

  /** Deflate-ratio guess for [[stats]], configurable via
    * `spark.graft.statsInflation`: BGZF text payloads inflate ~3-6×,
    * but genotype-dense cohort VCF/BCF commonly bgzips 10×+ — an
    * understated sizeInBytes can flip a sort-merge join into
    * broadcasting an over-threshold frame, so raise the conf for
    * genotype-dense layouts (or lower it for sparse site-only data).
    */
  private val DefaultInflation = 6L

  private[sources] def inflationFactor(spark: SparkSession): Long =
    spark.conf.get("spark.graft.statsInflation",
      DefaultInflation.toString).toLong

  /** `SupportsReportStatistics` body shared by the three scans: planned
    * (compressed) bytes × the inflation factor — PRUNED and full-scan
    * cases alike (both report compressed window bytes; the full scan's
    * windows simply tile whole files) — so Catalyst can see that a
    * pruned region slice of a 100 GB cohort is broadcast-small, where
    * the DSv2 default (spark.sql.defaultSizeInBytes = Long.Max) would
    * sort-merge every join against it.
    */
  def stats(parts: Array[InputPartition], factor: Long): Statistics = {
    val bytes = parts.collect {
      case p: BgzfScanPartition => p.end - p.start
    }.sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, bytes * factor))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  def hadoopConf(spark: SparkSession)
    : org.apache.spark.SerializableWritable[
      org.apache.hadoop.conf.Configuration] =
    new org.apache.spark.SerializableWritable(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration))
}

// ------------------------------------------------------------------ BCF

class BcfBgzfSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VcfBgzfSource.schema
  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // original-case map (asCaseSensitiveMap) — re-wrap, see
    // [[VcfBgzfSource.getTable]]
    val opts = new CaseInsensitiveStringMap(properties)
    new BcfBgzfTable(opts.get("path"),
      Option(opts.get("affields")).map(_.split(",").toSeq)
        .getOrElse(Vcf.defaultAfFields),
      Option(opts.get("splitsize")).map(_.toLong)
        .getOrElse(32L << 20),
      Option(opts.get("windowplan")))
  }
  // supportsExternalMetadata stays false (the default): the row shape
  // is fixed by the container, so a user-supplied schema is a clear
  // AnalysisException, not a silent override
}

private[sources] class BcfBgzfTable(path: String, afFields: Seq[String],
                                    splitSize: Long,
                                    windowPlanId: Option[String] = None)
  extends Table with SupportsRead {
  require(path != null, "graft.sources.BcfBgzfSource needs a path")
  override def name(): String = s"graft_bcf($path)"
  override def schema(): StructType = VcfBgzfSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
      with SupportsPushDownRequiredColumns {
      private var required: StructType = VcfBgzfSource.schema
      private var e = BgzfPush.Unextracted
      override def pushFilters(fs: Array[Filter]): Array[Filter] = {
        e = BgzfPush.extract(fs, "chrom", "pos"); fs
      }
      override def pushedFilters(): Array[Filter] = e.used
      override def pruneColumns(s: StructType): Unit = required = s
      override def build(): Scan =
        new BcfBgzfScan(path, afFields, splitSize, required, e,
          windowPlanId)
    }
}

private[sources] class BcfBgzfScan(path: String, afFields: Seq[String],
    splitSize: Long, required: StructType, e: BgzfPush.Extracted,
    windowPlanId: Option[String] = None)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    BgzfPush.describe("graft_bcf", path, e, windowPlanId)

  // runtime join pruning: a broadcast join against a small panel on
  // chrom hands the build side's key set here, and the scan re-plans
  // to those chromosomes' windows (the windowPlan route already
  // bisected — its windows are opaque bytes, so it opts out)
  override def filterAttributes(): Array[NamedReference] =
    if (windowPlanId.isDefined) Array.empty
    else Array(Expressions.column("chrom"))
  override def filter(predicates: Array[Predicate]): Unit =
    BgzfPush.runtimeChromSet(predicates, "chrom")
      .foreach(s => runtimeChroms = Some(s))

  @volatile private var runtimeChroms: Option[Set[String]] = None
  private var cachedChroms: Option[Set[String]] = None
  private var cachedParts: Array[InputPartition] = null

  // one shared byte plan: estimateStatistics (optimizer-time) and
  // planInputPartitions (physical planning) see the same windows — the
  // cache re-keys when a runtime filter lands between the two; a
  // registered windowPlan (the region-API route) tiles verbatim
  private def parts: Array[InputPartition] = synchronized {
    if (cachedParts == null || cachedChroms != runtimeChroms) {
      cachedChroms = runtimeChroms
      cachedParts = windowPlanId match {
        case Some(id) =>
          BgzfPush.tile(BgzfPush.windowPlan(id), splitSize)
        case None =>
          val spark = SparkSession.active
          BgzfPush.plan(spark, path, splitSize,
            BgzfPush.applyRuntime(e, runtimeChroms),
            rs => Bcf.regionPlan(spark, path, rs, maxSpan = 0L))
      }
    }
    cachedParts
  }

  override def planInputPartitions(): Array[InputPartition] = parts

  override def estimateStatistics(): Statistics =
    BgzfPush.stats(parts, BgzfPush.inflationFactor(SparkSession.active))

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new BcfBgzfReaderFactory(BgzfPush.hadoopConf(spark),
      required.fieldNames, afFields,
      Bgzf.alignGuard(spark, "graft.bcf.unaligned.ranges"))
  }
}

private[sources] class BcfBgzfReaderFactory(
    hconf: org.apache.spark.SerializableWritable[
      org.apache.hadoop.conf.Configuration],
    fieldNames: Array[String], afFields: Seq[String],
    guard: Bgzf.AlignGuard)
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BgzfScanPartition]
    val hp = new org.apache.hadoop.fs.Path(p.path)
    val in = hp.getFileSystem(hconf.value).open(hp)
    // construction is eager (header cursor + alignment): close the
    // handle before rethrowing, or every failed task attempt leaks one.
    // A pruned schema without `genotypes` skips the per-sample block
    // decode entirely (guide §6 — the binary analog of the VCF
    // split-limit): the block's bytes are dropped from the member
    // cursor undecoded.
    val recs =
      try Bcf.splitRangeRecords(in, p.path, p.start, p.end, p.len, guard,
        needGenotypes = fieldNames.contains("genotypes"))
      catch { case t: Throwable =>
        try in.close() catch { case _: java.io.IOException => }
        throw t
      }
    val patterns = VcfBgzfSource.afPatterns(afFields)
    val extractors: Array[BcfRec => Any] = fieldNames.map {
      case "chrom" => (r: BcfRec) => UTF8String.fromString(r.chrom)
      case "pos" => (r: BcfRec) => r.pos
      case "id" => (r: BcfRec) => UTF8String.fromString(r.id)
      case "ref" => (r: BcfRec) => UTF8String.fromString(r.ref)
      case "alt" => (r: BcfRec) => UTF8String.fromString(r.alt)
      case "qual" => (r: BcfRec) => UTF8String.fromString(r.qual)
      case "filter" => (r: BcfRec) => UTF8String.fromString(r.filter)
      case "info" => (r: BcfRec) => UTF8String.fromString(r.info)
      case "genotypes" => (r: BcfRec) => new GenericArrayData(
        r.genotypes.map(UTF8String.fromString(_): Any).toArray)
      case "af" => (r: BcfRec) => UTF8String.fromString(
        VcfBgzfSource.afOf(r.info, patterns))
      case other =>
        throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!recs.hasNext) return false
        val r = recs.next()
        row = InternalRow.fromSeq(extractors.map(_(r)).toIndexedSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit =
        try in.close() catch { case _: java.io.IOException => }
    }
  }
}

// ------------------------------------------------------------------ BAM

class BamBgzfSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BamBgzfSource.schema
  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // original-case map (asCaseSensitiveMap) — re-wrap, see
    // [[VcfBgzfSource.getTable]]
    val opts = new CaseInsensitiveStringMap(properties)
    new BamBgzfTable(opts.get("path"),
      Option(opts.get("splitsize")).map(_.toLong)
        .getOrElse(32L << 20),
      Option(opts.get("windowplan")))
  }
  // supportsExternalMetadata stays false (the default) — see the BCF
  // twin above
}

private[sources] object BamBgzfSource {
  /** The [[BamRec]] base row shape ([[Sam.decorate]] adds its flag/
    * ref_end projection on top — filters push through it).
    */
  val schema: StructType = StructType(Seq(
    StructField("qname", StringType),
    StructField("flag", IntegerType, nullable = false),
    StructField("rname", StringType),
    StructField("pos", LongType),
    StructField("mapq", IntegerType, nullable = false),
    StructField("cigar", StringType),
    StructField("rnext", StringType),
    StructField("pnext", LongType),
    StructField("tlen", LongType, nullable = false),
    StructField("seq", StringType),
    StructField("qual", StringType),
    StructField("tags", StringType)))
}

private[sources] class BamBgzfTable(path: String, splitSize: Long,
                                    windowPlanId: Option[String] = None)
  extends Table with SupportsRead {
  require(path != null, "graft.sources.BamBgzfSource needs a path")
  override def name(): String = s"graft_bam($path)"
  override def schema(): StructType = BamBgzfSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownFilters
      with SupportsPushDownRequiredColumns {
      private var required: StructType = BamBgzfSource.schema
      private var e = BgzfPush.Unextracted
      override def pushFilters(fs: Array[Filter]): Array[Filter] = {
        e = BgzfPush.extract(fs, "rname", "pos"); fs
      }
      override def pushedFilters(): Array[Filter] = e.used
      override def pruneColumns(s: StructType): Unit = required = s
      override def build(): Scan =
        new BamBgzfScan(path, splitSize, required, e, windowPlanId)
    }
}

private[sources] class BamBgzfScan(path: String, splitSize: Long,
    required: StructType, e: BgzfPush.Extracted,
    windowPlanId: Option[String] = None)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeV2Filtering {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    BgzfPush.describe("graft_bam", path, e, windowPlanId)

  // runtime join pruning on the reference-name key — see the BCF twin
  override def filterAttributes(): Array[NamedReference] =
    if (windowPlanId.isDefined) Array.empty
    else Array(Expressions.column("rname"))
  override def filter(predicates: Array[Predicate]): Unit =
    BgzfPush.runtimeChromSet(predicates, "rname")
      .foreach(s => runtimeChroms = Some(s))

  @volatile private var runtimeChroms: Option[Set[String]] = None
  private var cachedChroms: Option[Set[String]] = None
  private var cachedParts: Array[InputPartition] = null

  private def parts: Array[InputPartition] = synchronized {
    if (cachedParts == null || cachedChroms != runtimeChroms) {
      cachedChroms = runtimeChroms
      cachedParts = windowPlanId match {
        case Some(id) =>
          BgzfPush.tile(BgzfPush.windowPlan(id), splitSize)
        case None =>
          val spark = SparkSession.active
          BgzfPush.plan(spark, path, splitSize,
            BgzfPush.applyRuntime(e, runtimeChroms),
            rs => Bam.regionPlan(spark, path, rs, maxSpan = 0L))
      }
    }
    cachedParts
  }

  override def planInputPartitions(): Array[InputPartition] = parts

  override def estimateStatistics(): Statistics =
    BgzfPush.stats(parts, BgzfPush.inflationFactor(SparkSession.active))

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new BamBgzfReaderFactory(BgzfPush.hadoopConf(spark),
      required.fieldNames,
      Bgzf.alignGuard(spark, "graft.bam.unaligned.ranges"))
  }
}

private[sources] class BamBgzfReaderFactory(
    hconf: org.apache.spark.SerializableWritable[
      org.apache.hadoop.conf.Configuration],
    fieldNames: Array[String], guard: Bgzf.AlignGuard)
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BgzfScanPartition]
    val hp = new org.apache.hadoop.fs.Path(p.path)
    val in = hp.getFileSystem(hconf.value).open(hp)
    // close before rethrowing a construction failure — see the BCF twin
    val recs =
      try Bam.splitRangeRecords(in, p.path, p.start, p.end, p.len, guard)
      catch { case t: Throwable =>
        try in.close() catch { case _: java.io.IOException => }
        throw t
      }
    def s(v: String): AnyRef = UTF8String.fromString(v)
    def os(v: Option[String]): AnyRef = v.map(s).orNull
    def ol(v: Option[Long]): AnyRef = v.map(Long.box).orNull
    val extractors: Array[BamRec => Any] = fieldNames.map {
      case "qname" => (r: BamRec) => s(r.qname)
      case "flag" => (r: BamRec) => r.flag
      case "rname" => (r: BamRec) => os(r.rname)
      case "pos" => (r: BamRec) => ol(r.pos)
      case "mapq" => (r: BamRec) => r.mapq
      case "cigar" => (r: BamRec) => s(r.cigar)
      case "rnext" => (r: BamRec) => os(r.rnext)
      case "pnext" => (r: BamRec) => ol(r.pnext)
      case "tlen" => (r: BamRec) => r.tlen
      case "seq" => (r: BamRec) => os(r.seq)
      case "qual" => (r: BamRec) => os(r.qual)
      case "tags" => (r: BamRec) => os(r.tags)
      case other =>
        throw new IllegalArgumentException(s"unknown column $other")
    }
    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!recs.hasNext) return false
        val r = recs.next()
        row = InternalRow.fromSeq(extractors.map(_(r)).toIndexedSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit =
        try in.close() catch { case _: java.io.IOException => }
    }
  }
}
