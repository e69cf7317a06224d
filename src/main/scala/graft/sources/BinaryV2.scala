package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
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

  case class Extracted(chroms: Option[Seq[String]], lo: Long, hi: Long,
                       used: Array[Filter])

  /** Extract the prunable conjuncts over (`chromCol`, `posCol`) —
    * shared by all three container ScanBuilders.
    */
  def extract(filters: Array[Filter], chromCol: String,
              posCol: String): Extracted = {
    var chroms: Option[Seq[String]] = None
    var lo = 0L
    var hi = Int.MaxValue.toLong
    val used = Array.newBuilder[Filter]
    filters.foreach {
      case f @ EqualTo(`chromCol`, c: String) if chroms.isEmpty =>
        chroms = Some(Seq(c)); used += f
      case f @ In(`chromCol`, vs) if chroms.isEmpty &&
        vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        chroms = Some(vs.map(_.asInstanceOf[String]).toSeq); used += f
      case f @ EqualTo(`posCol`, v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v); used += f
      case f @ GreaterThanOrEqual(`posCol`, v: Long) =>
        lo = math.max(lo, v); used += f
      case f @ GreaterThan(`posCol`, v: Long) =>
        lo = math.max(lo, v + 1); used += f
      case f @ LessThanOrEqual(`posCol`, v: Long) =>
        hi = math.min(hi, v); used += f
      case f @ LessThan(`posCol`, v: Long) =>
        hi = math.min(hi, v - 1); used += f
      case _ =>
    }
    Extracted(chroms, lo, hi, used.result())
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

  /** Windows (or whole files when no conjunct is usable) tiled into
    * partitions — the shared planInputPartitions body of the binary
    * relations (the VCF relation adds a full-scan-fallback class on
    * top of this in [[VcfBgzfScan]]).
    */
  def plan(spark: SparkSession, path: String, splitSize: Long,
           e: Extracted,
           regionPlan: Seq[(String, Long, Long)] => Vcf.RegionPlan)
    : Array[InputPartition] = {
    if (e.lo > e.hi) return Array.empty // contradictory: statically empty
    val windows = e.chroms match {
      case Some(cs) => regionPlan(cs.map(c => (c, e.lo, e.hi))).windows
      case None => Bgzf.resolveFiles(spark, path).map { case (fp, len) =>
        Bgzf.FileWindow(fp, len, 0L, len, 0)
      }
    }
    tile(windows, splitSize)
  }

  def describe(name: String, path: String, e: Extracted): String =
    if (e.used.isEmpty) s"$name $path (full scan)"
    else s"$name $path (PushedFilters: [${e.used.mkString(", ")}], " +
      s"window chrom=${e.chroms.map(_.mkString("|")).getOrElse("*")} " +
      s"pos=[${e.lo},${e.hi}])"

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
        .getOrElse(32L << 20))
  }
  override def supportsExternalMetadata(): Boolean = true
}

private[sources] class BcfBgzfTable(path: String, afFields: Seq[String],
                                    splitSize: Long)
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
      private var e = BgzfPush.Extracted(None, 0L, Int.MaxValue.toLong,
        Array.empty)
      override def pushFilters(fs: Array[Filter]): Array[Filter] = {
        e = BgzfPush.extract(fs, "chrom", "pos"); fs
      }
      override def pushedFilters(): Array[Filter] = e.used
      override def pruneColumns(s: StructType): Unit = required = s
      override def build(): Scan =
        new BcfBgzfScan(path, afFields, splitSize, required, e)
    }
}

private[sources] class BcfBgzfScan(path: String, afFields: Seq[String],
    splitSize: Long, required: StructType, e: BgzfPush.Extracted)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    BgzfPush.describe("graft_bcf", path, e)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    BgzfPush.plan(spark, path, splitSize, e,
      rs => Bcf.regionPlan(spark, path, rs, maxSpan = 0L))
  }

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
    val recs =
      Bcf.splitRangeRecords(in, p.path, p.start, p.end, p.len, guard)
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
        .getOrElse(32L << 20))
  }
  override def supportsExternalMetadata(): Boolean = true
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

private[sources] class BamBgzfTable(path: String, splitSize: Long)
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
      private var e = BgzfPush.Extracted(None, 0L, Int.MaxValue.toLong,
        Array.empty)
      override def pushFilters(fs: Array[Filter]): Array[Filter] = {
        e = BgzfPush.extract(fs, "rname", "pos"); fs
      }
      override def pushedFilters(): Array[Filter] = e.used
      override def pruneColumns(s: StructType): Unit = required = s
      override def build(): Scan =
        new BamBgzfScan(path, splitSize, required, e)
    }
}

private[sources] class BamBgzfScan(path: String, splitSize: Long,
    required: StructType, e: BgzfPush.Extracted)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    BgzfPush.describe("graft_bam", path, e)

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    BgzfPush.plan(spark, path, splitSize, e,
      rs => Bam.regionPlan(spark, path, rs, maxSpan = 0L))
  }

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
    val recs =
      Bam.splitRangeRecords(in, p.path, p.start, p.end, p.len, guard)
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
