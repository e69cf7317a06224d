package graft.sources

import java.util.regex.Pattern

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 relation over sorted BGZF VCF — the piece that makes
  * region pruning AUTOMATIC for SQL users: `readRegion` prunes only
  * when callers know to ask for it, but the plan you want at 100× is
  * the one `Vcf.readAuto(path).where("chrom='17' AND pos BETWEEN a
  * AND b")` produces on its own. This source implements
  * `SupportsPushDownFilters`: Catalyst hands the scan the conjunctive
  * top-level filters, the builder extracts a `chrom` equality (or IN)
  * plus `pos` bounds, and `planInputPartitions` turns them into the
  * SAME per-file bisected byte windows `readRegion` uses
  * ([[Vcf.regionPlan]] — sharded directories/globs bisect per shard,
  * unrankable files full-scan, merged windows tile into ranges). Every
  * filter is also RETAINED for Spark to re-apply above the scan
  * (`pushFilters` returns its input), so the window's bounded overhang
  * of out-of-range rows is invisible and pruning can never change
  * results — only skip bytes. `SupportsPushDownRequiredColumns` prunes
  * the per-line parse (a `select(chrom, pos)` never splits genotype
  * columns or allocates the array).
  *
  * Row parity: the partition reader re-implements [[Vcf.parseLines]]'s
  * column semantics record-for-record (raw-line header/blank filter
  * with Spark's space-only `trim`, trailing-`\r` strip before an
  * unlimited split, digit-guarded 18-digit pos cast, `slice(f, 10, …)`
  * genotypes, first-matching `afFields` INFO extraction with the same
  * unanchored regex) — VcfV2Spec pins read-vs-read row identity and
  * the g59 gate pins it against the independent DuckDB text parse.
  *
  * Usage: `spark.read.format("graft.sources.VcfBgzfSource")
  * .load(path)` — [[Vcf.readAuto]] routes its splittable-BGZF branch
  * here, so SQL-shaped access gets pruning with no API change. BGZF
  * files only (plain text already flows through `spark.read.text`,
  * where there is no member chain to prune).
  */
class VcfBgzfSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    VcfBgzfSource.schema

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    // Spark hands getTable the ORIGINAL-case option map
    // (asCaseSensitiveMap) — re-wrap so `.option("afFields", …)` /
    // `.option("splitSize", …)` resolve regardless of caller casing
    val opts = new CaseInsensitiveStringMap(properties)
    new VcfBgzfTable(opts.get("path"),
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

private[sources] object VcfBgzfSource {
  /** The [[Vcf.parseLines]] row shape, fixed order. */
  val schema: StructType = StructType(Seq(
    StructField("chrom", StringType),
    StructField("pos", LongType),
    StructField("id", StringType),
    StructField("ref", StringType),
    StructField("alt", StringType),
    StructField("qual", StringType),
    StructField("filter", StringType),
    StructField("info", StringType),
    StructField("genotypes", ArrayType(StringType, containsNull = true),
      nullable = false),
    StructField("af", StringType)))

  /** [[Casts.tryLong]]'s digit guard, record-side. */
  private val LongGuard = Pattern.compile("^-?[0-9]{1,18}$")

  private[sources] def tryLong(s: String): java.lang.Long =
    if (s != null && LongGuard.matcher(s).matches())
      java.lang.Long.valueOf(s)
    else null

  /** [[Vcf.infoField]] record-side: first unanchored `(?:^|;)key=` hit,
    * empty → null (the group can't be empty, kept for exact parity).
    */
  private[sources] def afOf(info: String,
                            patterns: Seq[Pattern]): String = {
    if (info == null) return null
    patterns.foreach { p =>
      val m = p.matcher(info)
      if (m.find()) {
        val g = m.group(1)
        if (g != null && g.nonEmpty) return g
      }
    }
    null
  }

  private[sources] def afPatterns(afFields: Seq[String]): Seq[Pattern] =
    afFields.map(k => Pattern.compile("(?:^|;)" + k + "=([^;]+)"))

  /** parseLines' raw-line drop: '#' rows and blank rows — Spark's
    * `trim` strips ASCII spaces only, so a tabs-only line is KEPT
    * (parses to empty fields) exactly as the column pipeline keeps it.
    */
  private[sources] def isData(line: String): Boolean =
    line.nonEmpty && line.charAt(0) != '#' && line.exists(_ != ' ')

  /** One shared column -> source-tab-field table: BOTH the split bound
    * (maxField) and the per-column extractors derive from it, so the
    * two can never drift (r17 advice — they were previously two
    * hand-maintained copies of the same indices). `genotypes` (fields
    * 10+) is the only column outside the table; it forces a full split.
    */
  private[sources] val FieldOf: Map[String, Int] = Map(
    "chrom" -> 0, "pos" -> 1, "id" -> 2, "ref" -> 3, "alt" -> 4,
    "qual" -> 5, "filter" -> 6, "info" -> 7, "af" -> 7)

  private[sources] def fieldIndex(name: String): Int =
    FieldOf.getOrElse(name,
      throw new IllegalArgumentException(s"unknown column $name"))
}

private[sources] class VcfBgzfTable(path: String, afFields: Seq[String],
                                    splitSize: Long,
                                    windowPlanId: Option[String] = None)
  extends Table with SupportsRead {
  require(path != null, "graft.sources.VcfBgzfSource needs a path")

  override def name(): String = s"graft_vcf_bgzf($path)"
  override def schema(): StructType = VcfBgzfSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): ScanBuilder =
    new VcfBgzfScanBuilder(path, afFields, splitSize, windowPlanId)
}

private[sources] class VcfBgzfScanBuilder(path: String,
                                          afFields: Seq[String],
                                          splitSize: Long,
                                          windowPlanId: Option[String])
  extends ScanBuilder with SupportsPushDownFilters
  with SupportsPushDownRequiredColumns {

  private var required: StructType = VcfBgzfSource.schema
  private var e = BgzfPush.Unextracted

  /** Extract the prunable predicates — chrom equality/IN plus pos
    * bounds, in conjunct OR bounded-DNF panel shape ([[BgzfPush
    * .extract]], shared with the BCF/BAM relations). EVERYTHING is
    * returned as residual (Spark re-applies all filters above the
    * scan), so extraction can only skip bytes, never rows: the window
    * contract guarantees every line matching the extracted predicates
    * lies inside the planned windows.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    e = BgzfPush.extract(filters, "chrom", "pos")
    filters
  }

  override def pushedFilters(): Array[Filter] = e.used

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new VcfBgzfScan(path, afFields, splitSize, required, e, windowPlanId)
}

/** One byte range of one file — the DSv2 partition (package-visible so
  * the specs can pin scanned-byte totals off the physical plan).
  */
private[graft] case class BgzfScanPartition(path: String, start: Long,
                                           end: Long, len: Long)
  extends InputPartition

private[sources] class VcfBgzfScan(path: String, afFields: Seq[String],
    splitSize: Long, required: StructType, e: BgzfPush.Extracted,
    windowPlanId: Option[String] = None)
  extends Scan with Batch with SupportsReportStatistics
  with SupportsRuntimeV2Filtering {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    BgzfPush.describe("graft_vcf_bgzf", path, e, windowPlanId)

  /** Runtime join pruning ([[BgzfPush.runtimeChromSet]]): a broadcast
    * join `readTable ⋈ small panel ON chrom` re-plans the scan to the
    * build side's chromosomes — the join-shaped twin of a literal
    * `WHERE chrom IN (…)`. The windowPlan route opts out (its windows
    * are already bisected, opaque bytes).
    */
  override def filterAttributes(): Array[NamedReference] =
    if (windowPlanId.isDefined) Array.empty
    else Array(Expressions.column("chrom"))
  override def filter(predicates: Array[Predicate]): Unit =
    BgzfPush.runtimeChromSet(predicates, "chrom")
      .foreach(s => runtimeChroms = Some(s))

  @volatile private var runtimeChroms: Option[Set[String]] = None
  private var cachedChroms: Option[Set[String]] = None
  private var cachedParts: Array[InputPartition] = null

  /** Driver-side byte plan: a registered `windowPlan` (the region-API
    * route — [[Vcf.readRegions]] already bisected, with its overlap
    * maxSpan) tiles verbatim; else with usable chrom disjuncts, the
    * exact [[Vcf.regionPlan]] bisection (maxSpan 0 — the predicate is
    * on pos itself, so no REF-span back-off is needed to keep every
    * MATCHING row inside the window); otherwise, or for files the plan
    * can't rank, full-file tiling. Non-BGZF bytes are a loud error —
    * this source exists for the member-chain layout. One shared lazy
    * plan: estimateStatistics and planInputPartitions see the same
    * windows.
    */
  private def parts: Array[InputPartition] = synchronized {
    if (cachedParts == null || cachedChroms != runtimeChroms) {
      cachedChroms = runtimeChroms
      cachedParts = windowPlanId match {
        case Some(id) =>
          BgzfPush.tile(BgzfPush.windowPlan(id), splitSize)
        case None =>
          planParts(BgzfPush.applyRuntime(e, runtimeChroms))
      }
    }
    cachedParts
  }

  private def planParts(e: BgzfPush.Extracted): Array[InputPartition] = {
    val spark = SparkSession.active
    val windows = e.regions match {
      case Some(rs) if rs.isEmpty =>
        Seq.empty // statically contradictory filters
      case Some(rs) =>
        val plan = Vcf.regionPlan(spark, path, rs, maxSpan = 0L)
        plan.fullScan.foreach { f =>
          require(f.isBgzf,
            s"graft.sources.VcfBgzfSource wants BGZF files; ${f.path} " +
              "is not (read plain text through Vcf.read)")
        }
        plan.windows ++ plan.fullScan.map(f =>
          Bgzf.FileWindow(f.path, f.len, 0L, f.len, 0))
      case None =>
        val files = Bgzf.resolveFiles(spark, path)
        // one 18-byte signature peek, first file only — a non-BGZF
        // file elsewhere in the directory fails loudly per range at
        // read time ("not a BGZF member"), without an N-open planning
        // pass here
        files.headOption.foreach { case (fp, _) =>
          require(Bgzf.isBgzfOver(spark, fp, 0L),
            s"graft.sources.VcfBgzfSource wants BGZF files; $fp is " +
              "not (read plain text through Vcf.read)")
        }
        files.map { case (fp, len) =>
          Bgzf.FileWindow(fp, len, 0L, len, 0)
        }
    }
    BgzfPush.tile(windows, splitSize)
  }

  override def planInputPartitions(): Array[InputPartition] = parts

  override def estimateStatistics(): Statistics =
    BgzfPush.stats(parts, BgzfPush.inflationFactor(SparkSession.active))

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    new VcfBgzfReaderFactory(BgzfPush.hadoopConf(spark),
      required.fieldNames, afFields)
  }
}

private[sources] class VcfBgzfReaderFactory(
    hconf: org.apache.spark.SerializableWritable[
      org.apache.hadoop.conf.Configuration],
    fieldNames: Array[String], afFields: Seq[String])
  extends PartitionReaderFactory {

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[BgzfScanPartition]
    val hp = new org.apache.hadoop.fs.Path(p.path)
    val in = hp.getFileSystem(hconf.value).open(hp)
    // construction is eager (member scan + boundary probe): close the
    // handle before rethrowing, or every failed task attempt leaks one
    val lines =
      try Bgzf.rangeLinesOf(in,
        Bgzf.Range(p.path, p.start, p.end, p.len))
        .filter(VcfBgzfSource.isData)
      catch { case t: Throwable =>
        try in.close() catch { case _: java.io.IOException => }
        throw t
      }
    val patterns = VcfBgzfSource.afPatterns(afFields)
    // Bound the tab-split by the LAST field the pruned schema touches:
    // a (chrom, pos) panel scan over a 20-sample cohort must not
    // materialize 29 field strings per line — split with limit k+2
    // yields fields 0..k intact plus one un-split remainder. Only a
    // schema that asks for `genotypes` (fields 10+) needs the full
    // split.
    val maxField: Int =
      if (fieldNames.contains("genotypes")) Int.MaxValue
      else fieldNames.map(VcfBgzfSource.fieldIndex).foldLeft(0)(math.max)
    val splitLimit = if (maxField == Int.MaxValue) -1 else maxField + 2
    // one extractor per REQUIRED column, each bound to the SAME shared
    // field table the split bound came from — a pruned scan never
    // splits genotype columns it will not emit
    val extractors: Array[Array[String] => Any] = fieldNames.map {
      case "pos" =>
        val i = VcfBgzfSource.fieldIndex("pos")
        (f: Array[String]) =>
          if (f.length > i) VcfBgzfSource.tryLong(f(i)) else null
      case "genotypes" => (f: Array[String]) =>
        new GenericArrayData(
          f.drop(9).map(UTF8String.fromString(_): Any))
      case "af" =>
        val i = VcfBgzfSource.fieldIndex("af")
        (f: Array[String]) =>
          if (f.length > i)
            UTF8String.fromString(VcfBgzfSource.afOf(f(i), patterns))
          else null
      case name =>
        val i = VcfBgzfSource.fieldIndex(name)
        (f: Array[String]) =>
          if (f.length > i) UTF8String.fromString(f(i)) else null
    }

    new PartitionReader[InternalRow] {
      private var row: InternalRow = _
      override def next(): Boolean = {
        if (!lines.hasNext) return false
        val line = lines.next()
        val stripped =
          if (line.nonEmpty && line.charAt(line.length - 1) == '\r')
            line.substring(0, line.length - 1)
          else line
        val f = stripped.split("\t", splitLimit)
        row = InternalRow.fromSeq(
          extractors.map(_(f)).toIndexedSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit =
        try in.close() catch { case _: java.io.IOException => }
    }
  }
}
