package graft.sources

import java.io.{ByteArrayOutputStream, DataInputStream, EOFException,
  InputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col}

/** One BAM alignment record's mandatory fields, decoded to the exact
  * shape [[Sam.read]] parses from SAM text — same names, same types,
  * same null conventions — so [[Sam]]'s flag/CIGAR decoration and every
  * downstream operator (g8/g9/g23/g51/sam2...) consume BAM rows
  * unchanged.
  */
private[graft] case class BamRec(
  qname: String, flag: Int, rname: Option[String], pos: Option[Long],
  mapq: Int, cigar: String, rnext: Option[String], pnext: Option[Long],
  tlen: Long, seq: Option[String], qual: Option[String],
  tags: Option[String])

/** BAM binary alignment source + sink (SAM spec §4; the BGZF container
  * of htslib — what 100 TB of real read data actually arrives as; the
  * reference ecosystem's text tools only speak SAM, so this row is an
  * extension like src_bed/src_gff3).
  *
  * Layout handled natively, no external libs:
  *  - BGZF: concatenated RFC-1952 gzip members, each carrying the BC
  *    extra subfield (SI 66,67; BSIZE = member length - 1) and capped at
  *    64 KiB; a fixed 28-byte empty member marks EOF. Multi-member gzip
  *    is exactly what the JDK's GZIPInputStream already decodes (it
  *    skips FEXTRA and chains members, verifying each CRC32), so the
  *    read side needs zero custom inflate code.
  *  - BAM stream: "BAM\1", SAM-header text, reference dictionary, then
  *    little-endian records: fixed 32-byte prologue, NUL-terminated
  *    name, packed uint32 CIGAR ops ("MIDNSHP=X"), 4-bit nucleotides
  *    ("=ACMGRSVTWYHKDBN"), raw Phred quals (0xFF = absent), typed aux
  *    tags (A c C s S i I f Z H B).
  *
  * Scale model, read side: one task per FILE ([[read]]: `binaryFiles`
  * + a constant-memory streaming record iterator; real fleets arrive
  * as one BAM per sample) OR byte-range in-file splits with no index
  * ([[readSplit]], for the single-huge-file layout). Write side:
  * [[writeSharded]] — one valid BAM per partition, executor-side,
  * O(blockSize) task memory; [[write]] is the fixture-scale
  * single-file variant (driver collect, documented).
  *
  * Decode fidelity conventions (SAM spec §4.2, matching `samtools
  * view` output so rows compare equal to [[Sam.read]] on the same
  * reads): refID/next_refID -1 -> null names; 0-based positions
  * surface 1-based with -1 -> null; next_refID == refID prints "=";
  * l_seq 0 -> null seq; all-0xFF qual -> null; every BAM integer tag
  * width (c C s S i I) prints as SAM type 'i'.
  */
object Bam {

  private val SeqCode = "=ACMGRSVTWYHKDBN"
  private val CigarOps = "MIDNSHP=X"

  // -------------------------------------------------------------- read
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val recs = spark.sparkContext.binaryFiles(path)
      .flatMap { case (_, pds) => records(pds.open()) }
    Sam.decorate(recs.toDS().toDF())
  }

  // ---------------------------------------------------- splittable read
  /** Byte-range splittable BAM read — one huge BAM parallelizes across
    * tasks WITHOUT a .bai/splitting index. Two-layer alignment (the
    * spark-bam / Hadoop-BAM idea, rebuilt on this repo's BGZF
    * machinery):
    *
    *  1. container: anchor each range at its first signature-verified
    *     BGZF member start (18 fixed-layout bytes, BSIZE-chained —
    *     [[Bgzf]]);
    *  2. records: BAM records carry no sync marker and legally span
    *     members, so the range scans its inflated stream byte-by-byte
    *     for a PLAUSIBLE record start — block_size bounds, refID/
    *     next_refID within the reference dictionary, positions sane,
    *     read-name length/printability/NUL placement, fixed-section
    *     arithmetic fitting block_size — and requires a CHAIN of 3
    *     further plausible records before accepting. Each check is
    *     ~30 bits of constraint, so a payload byte pattern surviving a
    *     4-record chain is ~2^-100 per offset — practically impossible
    *     to mis-anchor; the per-file [[read]] stays available where
    *     even that is unacceptable.
    *
    * Ownership: a record belongs to the range in whose byte span its
    * first byte's MEMBER starts; the last owned record completes by
    * inflating into the next range's members, and the next range's
    * scan lands on the following record start. The reference
    * dictionary is re-read from the file head by every task (one or
    * two members — negligible against a multi-GB scan).
    */
  def readSplit(spark: SparkSession, path: String,
                splitSize: Long = 32L << 20): DataFrame =
    readSplitGuarded(spark, path, splitSize)._1

  /** [[readSplit]] plus its alignment accumulator ([[Bgzf.AlignGuard]]):
    * after the read's first action the accumulator holds the number of
    * ranges that anchored members but aligned no owned record —
    * nonzero on a corrupt payload (or records larger than splitSize).
    */
  private[graft] def readSplitGuarded(spark: SparkSession, path: String,
      splitSize: Long = 32L << 20)
    : (DataFrame, org.apache.spark.util.LongAccumulator) = {
    import spark.implicits._
    val sc = spark.sparkContext
    val guard = Bgzf.alignGuard(spark, "graft.bam.unaligned.ranges")
    case class R(path: String, start: Long, end: Long, len: Long)
    val ranges = Bgzf.resolveFiles(spark, path).flatMap { case (fp, len) =>
      val n = math.max(1L, (len + splitSize - 1) / splitSize)
      (0L until n).map(i => R(fp, i * splitSize,
        math.min((i + 1) * splitSize, len), len))
    }
    val hconf = new org.apache.spark.SerializableWritable(
      new org.apache.hadoop.conf.Configuration(sc.hadoopConfiguration))
    val recs = sc.parallelize(ranges, math.max(1, ranges.size))
      .flatMap { r =>
        val rp = new org.apache.hadoop.fs.Path(r.path)
        val in = rp.getFileSystem(hconf.value).open(rp)
        Bgzf.closeOnTaskEnd(in)
        splitRangeRecords(in, r.path, r.start, r.end, r.len, guard)
      }
    (Sam.decorate(recs.toDS().toDF()), guard.acc)
  }

  /** The DSv2 relation over sorted BAM ([[BamBgzfSource]]) wrapped in
    * [[Sam.decorate]]: same rows as [[readSplit]], plus automatic
    * region pruning — a `WHERE rname = '17' AND pos BETWEEN a AND b`
    * pushes through the decoration projection into the scan and routes
    * to the same per-file record-alignment bisection [[readRegion]]
    * plans.
    */
  def readTable(spark: SparkSession, path: String,
                splitSize: Long = 32L << 20): DataFrame =
    Sam.decorate(spark.read.format(classOf[BamBgzfSource].getName)
      .option("splitSize", splitSize.toString)
      .load(path))

  /** Consume the `BAM\1` magic + text header + reference dictionary
    * from a cursor at file offset 0; returns the cursor positioned at
    * the first record plus the reference names in dictionary order.
    */
  private def headerCursor(in: org.apache.hadoop.fs.FSDataInputStream,
                           len: Long): (Bgzf.MemberCursor, Array[String]) = {
    val (head, dict) = headerDict(in, len)
    (head, dict.map(_._1))
  }

  /** [[headerCursor]] keeping each reference's declared length too
    * (the `@SQ LN:` twin the binary dictionary carries natively) —
    * what [[idxstatsIndexed]] reports per row.
    */
  private def headerDict(in: org.apache.hadoop.fs.FSDataInputStream,
                         len: Long)
    : (Bgzf.MemberCursor, Array[(String, Long)]) = {
    val head = new Bgzf.MemberCursor(in, len, 0L)
    require(head.ensure(12), "empty BAM")
    require(head.byte(0) == 'B' && head.byte(1) == 'A' &&
      head.byte(2) == 'M' && head.byte(3) == 1, "not a BAM stream")
    val lText = head.le32(4)
    head.drop(8 + lText)
    require(head.ensure(4), "truncated BAM header")
    val nRef = head.le32(0)
    head.drop(4)
    val refs = Array.tabulate(nRef) { _ =>
      head.ensure(4)
      val lName = head.le32(0)
      head.ensure(8 + lName)
      val name = new String(
        Array.tabulate(lName - 1)(i => head.byte(4 + i)), "US-ASCII")
      val lRef = head.le32(4 + lName).toLong
      head.drop(8 + lName) // l_name + name + l_ref
      (name, lRef)
    }
    (head, refs)
  }

  /** `samtools idxstats` served entirely from the `.bai` pseudo-bins:
    * per-reference (rname, length, n_mapped, n_unmapped) plus the '*'
    * placeless-unmapped row from the trailing n_no_coor — header +
    * index metadata only, ZERO data bytes scanned, where the scan
    * route ([[Sam.idxstats]]) reads the whole file. Requires a usable
    * sidecar (same staleness rules as region planning); throws when
    * none exists — a silent fallback to the full scan would defeat
    * the caller's reason for asking for the index path.
    */
  def idxstatsIndexed(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val dict =
      try headerDict(in, fs.getFileStatus(p).getLen)._2
      finally { try in.close() catch { case _: java.io.IOException => } }
    val bare =
      if (path.endsWith(".bam")) Some(path.dropRight(4) + ".bai")
      else None
    val idx = Tabix.sidecar(conf, path,
      Seq((path + ".bai", Tabix.readBai _)) ++
        bare.map(b => (b, Tabix.readBai _)))
      .getOrElse(throw new IllegalArgumentException(
        s"$path has no usable .bai sidecar — write one with " +
          "Bam.writeIndex, or use Sam.idxstats for the scan route"))
    val rows = dict.zipWithIndex.map { case ((name, lRef), rid) =>
      val (nm, nu) =
        if (rid < idx.refs.size) idx.refs(rid).stats.getOrElse((0L, 0L))
        else (0L, 0L)
      (name, lRef, nm, nu)
    }.toSeq :+ (("*", 0L, 0L, idx.noCoor))
    spark.createDataFrame(rows)
      .toDF("rname", "length", "n_mapped", "n_unmapped")
  }

  /** Region read of a coordinate-sorted BAM — `samtools view
    * file.bam chr:start-end` semantics (reads OVERLAPPING the region)
    * without a .bai and without scanning the file: [[Bgzf.searchWindow]]
    * bisects the member chain with probes that align the first record
    * OWNED by a member via the [[readSplit]] plausible-chain machinery
    * and read its (refID, pos) prologue — the dictionary index is the
    * sort rank natively. Overlap (not containment) means a read can
    * START before the region and span into it, so the lower search
    * target backs off by `maxSpan` reference bases: reads whose
    * reference span exceeds it (default 1 Mb — beyond any short-read
    * and most long-read spans) may be missed, the same coarseness class
    * as the .bai linear index's 16 kb bins. Unmapped reads (refID -1)
    * sort after all mapped reads (samtools sort) and rank as +inf here,
    * so a region query never returns them. A chrom absent from the
    * dictionary cannot appear in any record → empty frame, no scan.
    * Sortedness contract = samtools sort (dictionary rank, then pos).
    */
  def readRegion(spark: SparkSession, path: String, chrom: String,
                 start: Long, end: Long, maxSpan: Long = 1L << 20,
                 splitSize: Long = 32L << 20): DataFrame =
    readRegions(spark, path, Seq((chrom, start, end)), maxSpan,
      splitSize)

  /** Multi-region (target-panel) BAM read over single files,
    * directories and globs — the [[Vcf.readRegions]] contract under
    * `samtools view` overlap semantics, including the repo's own
    * [[writeSharded]] layout: every shard is self-describing (full
    * header + dictionary) and independently sorted, so each bisects on
    * its own and the merged byte windows read in one distributed scan.
    * A chrom absent from a file's dictionary cannot appear in its
    * records — that (file, region) pair is skipped exactly, no scan.
    * Sortedness contract per shard = samtools sort (dictionary rank,
    * then pos, unmapped last — unmapped probes rank +inf so a region
    * query never returns them).
    */
  def readRegions(spark: SparkSession, path: String,
                  regions: Seq[(String, Long, Long)],
                  maxSpan: Long = 1L << 20,
                  splitSize: Long = 32L << 20): DataFrame = {
    import spark.implicits._
    require(regions.nonEmpty, "readRegions wants at least one region")
    val plan = regionPlan(spark, path, regions, maxSpan)
    if (!plan.windows.exists(w => w.toByte > w.fromByte))
      return Sam.decorate(spark.emptyDataset[BamRec].toDF())
    val inAny = regions.map { case (chrom, start, end) =>
      col("rname") === chrom && col("pos") <= end &&
        coalesce(col("ref_end"), col("pos")) >= start
    }.reduce(_ || _)
    // the merged windows read through the DSv2 relation with the plan
    // attached, so column pruning pushes through the decorate
    // projection into the record decode — see Vcf.readRegions
    Sam.decorate(spark.read.format(classOf[BamBgzfSource].getName)
      .option("splitSize", splitSize.toString)
      .option("windowPlan", BgzfPush.registerWindows(plan.windows))
      .load(path))
      .where(inAny)
  }

  /** [[readRegions]] with the panel carried as an interval FRAME (the
    * [[Bed.toIntervals]] shape) — the [[Vcf.readPanel]] contract under
    * samtools overlap semantics.
    */
  def readPanel(spark: SparkSession, path: String, panel: DataFrame,
                maxSpan: Long = 1L << 20, splitSize: Long = 32L << 20,
                maxRegions: Int = 100000): DataFrame =
    readRegions(spark, path, Vcf.collectPanel(panel, maxRegions),
      maxSpan, splitSize)

  /** Driver-side byte plan of [[readRegions]]: per (file, region)
    * bisected windows, merged per file. Package-visible for the probe-
    * count/window-size spec pins.
    */
  private[graft] def regionPlan(spark: SparkSession, path: String,
                                regions: Seq[(String, Long, Long)],
                                maxSpan: Long): Vcf.RegionPlan = {
    val files = Bgzf.resolveFiles(spark, path)
    val useIndex =
      spark.conf.get("spark.graft.useIndex", "true").toBoolean
    // per-file planning (header decode + bisections) is independent —
    // Bgzf.planFiles fans out across bounded driver threads, or as a
    // small Spark job past the distribute threshold, recombined in
    // file order for a deterministic plan
    val perFile = Bgzf.planFiles(spark, files, regions.size) {
      (conf, fp, len, _) =>
        planFile(conf, fp, len, regions, maxSpan, useIndex)
    }
    val windows = perFile.flatten
    Vcf.RegionPlan(Bgzf.mergeWindows(windows), Seq.empty,
      windows.map(_.probes).sum)
  }

  /** Build `path.bai` (SAM spec §5.2) in one streaming pass over the
    * record wire — the `samtools index` operation for the repo's own
    * [[writeSharded]] output (or any sorted BAM it receives). Each
    * record bins by its full reference span (pos + CIGAR reference
    * length), so index-served region reads find alignments longer
    * than the bisection's maxSpan back-off exactly. Unmapped records
    * (refID −1 or no position) count into `n_no_coor` and never bin —
    * a region read never returns them, the samtools contract
    * [[readRegion]] already implements. Unsorted input throws.
    */
  def writeIndex(conf: org.apache.hadoop.conf.Configuration,
                 path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val (cur, refs) = headerCursor(in, len)
      val b = new Tabix.Builder(path)
      while (cur.ensure(4)) {
        val begV = cur.headVOffset
        val blockSize = cur.le32(0)
        require(cur.ensure(4 + blockSize),
          s"truncated BAM record in $path")
        val refId = cur.le32(4)
        val pos = cur.le32(8)
        val lrn = cur.byte(12) & 0xff
        val nCigar = cur.le16(16)
        val flag = cur.le16(18)
        // reference-consuming CIGAR ops: M/D/N/=/X (0,2,3,7,8)
        var refLen = 0L
        val cigOff = 4 + 32 + lrn
        var k = 0
        while (k < nCigar) {
          val v = cur.le32(cigOff + 4 * k)
          val op = v & 0xf
          if (op == 0 || op == 2 || op == 3 || op == 7 || op == 8)
            refLen += (v >>> 4).toLong
          k += 1
        }
        cur.drop(4 + blockSize)
        val endV = cur.headVOffset
        if (refId >= 0 && pos >= 0)
          b.record(refId, pos.toLong, pos + math.max(1L, refLen),
            begV, endV, isMapped = (flag & 4) == 0)
        else b.noCoor()
      }
      Tabix.writeSidecar(conf, path + ".bai", b.baiBytes(refs.length))
    } finally { try in.close() catch { case _: java.io.IOException => } }
  }

  /** One file's share of [[regionPlan]] — Configuration-based so
    * [[Bgzf.planFiles]] can run it on executors for dense panel×fleet
    * plans.
    */
  private[sources] def planFile(
      conf: org.apache.hadoop.conf.Configuration, fp: String, len: Long,
      regions: Seq[(String, Long, Long)], maxSpan: Long,
      useIndex: Boolean = true)
    : Seq[Bgzf.FileWindow] = {
    // positions are int32: clamp so a caller's "to end of chrom"
    // end = Long.MaxValue can't bleed into the rank bits or wrap the
    // upper search target
    val maxPos = Int.MaxValue.toLong
    def key(r: Long, pos1: Long): Long = (r << 32) | (pos1 & 0xffffffffL)
    val windows = Seq.newBuilder[Bgzf.FileWindow]
    val p = new org.apache.hadoop.fs.Path(fp)
    val fs = p.getFileSystem(conf)
    val in0 = fs.open(p)
    val refs =
      try headerCursor(in0, len)._2
      finally { try in0.close() catch { case _: java.io.IOException => } }
    // a usable sidecar index (`x.bam.bai`, samtools' `x.bai` twin, or
    // a `.csi`) replaces the bisection: zero probes, exact spans past
    // the maxSpan back-off, ref ids resolved through THIS file's own
    // dictionary — see Vcf.planFile
    if (useIndex) {
      val bare =
        if (fp.endsWith(".bam")) Some(fp.dropRight(4) + ".bai") else None
      Tabix.sidecar(conf, fp,
        Seq((fp + ".bai", Tabix.readBai _)) ++
          bare.map(b => (b, Tabix.readBai _)) ++
          Seq((fp + ".csi", Tabix.readCsi _))) match {
        case Some(idx) =>
          return Tabix.queryWindows(idx, fp, len, regions, { c =>
            val r = refs.indexOf(c); if (r < 0) None else Some(r)
          })
        case None =>
      }
    }
    // regions whose chrom THIS file's dictionary ranks; the rest are
    // dictionary-closed empty for this file
    val ranked = regions.flatMap { case (chrom, start, end) =>
      val r = refs.indexOf(chrom)
      if (r < 0) None else Some((r, start, end))
    }
    if (ranked.nonEmpty) {
      // one shared positioned-read handle for every search of this
      // file; neither lambda closes it
      val sin = fs.open(p)
      try {
        // memoized per member — a panel's searches all start at the
        // same midpoint members
        val probeMemo =
          scala.collection.mutable.HashMap.empty[Long, Long]
        def probe(m: Long): Long = probeMemo.getOrElseUpdate(m, {
          val cur = new Bgzf.MemberCursor(sin, len, m)
          var aligned = false
          while (!aligned && cur.ensure(36)) {
            if (plausibleChain(cur, refs.length, 4)) aligned = true
            else cur.drop(1)
          }
          if (!aligned || !cur.ensure(12)) Long.MaxValue
          else {
            val refId = cur.le32(4)
            // unmapped (refID -1) sorts after every mapped read
            // (samtools sort); rank it +inf — the raw bit-packing
            // would produce a NEGATIVE key and corrupt the bisection
            // on any sorted BAM whose unmapped tail the search probes
            if (refId < 0) Long.MaxValue
            else key(refId.toLong,
              math.max(0L, math.min(cur.le32(8).toLong + 1L, maxPos)))
          }
        })
        val memberMemo =
          scala.collection.mutable.HashMap.empty[Long, Long]
        def nextMember(mid: Long): Long =
          memberMemo.getOrElseUpdate(mid,
            Bgzf.firstMemberIn(sin, mid, len, len))
        // sortedness verified, not assumed — see Vcf.planFile
        val checked = Bgzf.monotonicProbe(fp, probe)
        try ranked.foreach { case (rank, start, end) =>
          // saturate into [0, maxPos] before the back-off so a
          // degenerate Long bound clamps instead of wrapping
          val s0 = math.min(math.max(start, 0L), maxPos)
          val span = math.max(0L, maxSpan)
          val lo = if (span >= s0) 0L else s0 - span
          val hi = math.max(0L, math.min(end, maxPos))
          val w = Bgzf.searchWindow(len, nextMember, checked,
            key(rank.toLong, lo), key(rank.toLong, hi))
          windows += Bgzf.FileWindow(fp, len, w.fromByte, w.toByte,
            w.probes)
        } catch {
          // probe-key inversion: fall back to the whole file (replaces
          // any partial windows — they'd double-count its rows)
          case _: Bgzf.UnsortedFile =>
            return Seq(Bgzf.FileWindow(fp, len, 0L, len, 0))
        }
      } finally {
        try sin.close() catch { case _: java.io.IOException => }
      }
    }
    windows.result()
  }

  private[sources] def splitRangeRecords(
      in: org.apache.hadoop.fs.FSDataInputStream, path: String,
      start: Long, end: Long, len: Long,
      guard: Bgzf.AlignGuard): Iterator[BamRec] = {
    // every task decodes the reference dictionary from the file head
    val (head, refs) = headerCursor(in, len)
    if (start == 0L) {
      // range 0: records begin exactly after the dictionary — exact,
      // no scanning
      return recordIterator(head, end, refs)
    }
    val first = Bgzf.firstMemberIn(in, start, end, len)
    if (first < 0) { in.close(); return Iterator.empty }
    val cur = new Bgzf.MemberCursor(in, len, first)
    // scan the inflated stream for a validated record start while the
    // candidate byte's member is still owned by this range
    var aligned = false
    while (!aligned && cur.ensure(36) && cur.headMember < end) {
      if (plausibleChain(cur, refs.length, 4)) aligned = true
      else cur.drop(1)
    }
    if (!aligned || cur.headMember >= end) {
      // owned members aligned no record: silent per-range loss on a
      // corrupt payload — count it (throw under strictAlign)
      guard.unaligned(path, start, end)
      in.close(); return Iterator.empty
    }
    recordIterator(cur, end, refs)
  }

  /** Records from the cursor while their first byte's member starts
    * before `end` (the last owned record reads past `end` freely).
    */
  private def recordIterator(cur: Bgzf.MemberCursor, end: Long,
                             refs: Array[String]): Iterator[BamRec] =
    new Iterator[BamRec] {
      private var nextRec: BamRec = _
      private var done = false
      advance()
      private def advance(): Unit = {
        if (!cur.ensure(4) || cur.headMember >= end) {
          nextRec = null; done = true; cur.close(); return
        }
        val blockSize = cur.le32(0)
        require(cur.ensure(4 + blockSize), "truncated BAM record")
        val b = ByteBuffer.wrap(cur.read(4 + blockSize), 4, blockSize)
          .order(ByteOrder.LITTLE_ENDIAN)
        nextRec = decodeRecord(b.slice().order(ByteOrder.LITTLE_ENDIAN),
          refs)
      }
      override def hasNext: Boolean = !done
      override def next(): BamRec = { val r = nextRec; advance(); r }
    }

  /** `depth` chained plausible records at the cursor head (peek only).
    * Bounds sit at the spec's maxima, not at "typical" values — a bound
    * tighter than the spec rejects legal records (ONT ultralong reads,
    * qnames to 254 chars, positions to 2^31-1) and a rejected TRUE
    * anchor silently drops the whole range; the plausibility bits come
    * from the dictionary-bounded refIDs, the printable-NUL-terminated
    * name, the fixed-section arithmetic and the 4-record chain, not
    * from narrow magnitude caps.
    */
  private def plausibleChain(cur: Bgzf.MemberCursor, nRef: Int, depth: Int): Boolean = {
    var off = 0
    var k = 0
    while (k < depth) {
      if (!cur.ensure(off + 36)) return k > 0 // clean EOF ends a chain
      val bs = cur.le32(off)
      if (bs < 33 || bs > (1 << 30)) return false // 1 GiB: alloc ceiling
      val refId = cur.le32(off + 4)
      if (refId < -1 || refId >= nRef) return false
      val pos = cur.le32(off + 8)
      if (pos < -1) return false // any int32 position is spec-legal
      val lrn = cur.byte(off + 12) & 0xff
      if (lrn < 2) return false // uint8: up to 255 (254-char qname) legal
      val nCigar = (cur.byte(off + 16) & 0xff) |
        ((cur.byte(off + 17) & 0xff) << 8)
      val lSeq = cur.le32(off + 20)
      if (lSeq < 0) return false // fixed-section fit below bounds it vs bs
      val nextRef = cur.le32(off + 24)
      if (nextRef < -1 || nextRef >= nRef) return false
      val nextPos = cur.le32(off + 28)
      if (nextPos < -1) return false
      val fixed = 32L + lrn + 4L * nCigar + (lSeq.toLong + 1) / 2 +
        lSeq.toLong
      if (fixed > bs) return false
      // read name: printable, NUL exactly at its declared end
      if (!cur.ensure(off + 36 + lrn)) return k > 0
      var i = 0
      while (i < lrn - 1) {
        val c = cur.byte(off + 36 + i) & 0xff
        if (c < 0x21 || c > 0x7e) return false
        i += 1
      }
      if (cur.byte(off + 36 + lrn - 1) != 0) return false
      if (off + 4L + bs > Int.MaxValue - 64) return false // lookahead cap
      off += 4 + bs
      k += 1
    }
    true
  }


  /** Streaming record iterator over one BAM file's bytes. Package-
    * visible for byte-level spec tests.
    */
  private[graft] def records(raw: InputStream): Iterator[BamRec] = {
    val in = new DataInputStream(new GZIPInputStream(raw, 65536))
    def bytes(n: Int): Array[Byte] = {
      val b = new Array[Byte](n); in.readFully(b); b
    }
    def le(n: Int): ByteBuffer =
      ByteBuffer.wrap(bytes(n)).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bytes(4)
    require(magic(0) == 'B' && magic(1) == 'A' && magic(2) == 'M' &&
      magic(3) == 1, "not a BAM stream (bad magic)")
    val lText = le(4).getInt
    bytes(lText) // SAM header text: the dictionary below is authoritative
    val nRef = le(4).getInt
    val refs = Array.tabulate(nRef) { _ =>
      val lName = le(4).getInt
      val name = new String(bytes(lName), 0, lName - 1, "US-ASCII")
      le(4).getInt // l_ref, unused on read
      name
    }
    new Iterator[BamRec] {
      private var nextRec: BamRec = _
      private var done = false
      advance()
      private def advance(): Unit = {
        // block_size or clean EOF (the BGZF EOF member yields 0 bytes)
        val b0 = in.read()
        if (b0 < 0) { nextRec = null; done = true; in.close(); return }
        val rest = bytes(3)
        val blockSize = (b0 & 0xff) | ((rest(0) & 0xff) << 8) |
          ((rest(1) & 0xff) << 16) | ((rest(2) & 0xff) << 24)
        nextRec = decodeRecord(le(blockSize), refs)
      }
      override def hasNext: Boolean = !done
      override def next(): BamRec = {
        val r = nextRec; advance(); r
      }
    }
  }

  private def decodeRecord(b: ByteBuffer, refs: Array[String]): BamRec = {
    val refId = b.getInt
    val pos0 = b.getInt
    val lReadName = b.get & 0xff
    val mapq = b.get & 0xff
    b.getShort // bin (index hint, recomputable)
    val nCigar = b.getShort & 0xffff
    val flag = b.getShort & 0xffff
    val lSeq = b.getInt
    val nextRefId = b.getInt
    val nextPos0 = b.getInt
    val tlen = b.getInt
    val nameBytes = new Array[Byte](lReadName); b.get(nameBytes)
    val qname = new String(nameBytes, 0, lReadName - 1, "US-ASCII")
    // tight while-loops: this is the per-record hot path a multi-GB
    // file's single task spends its wall in
    val cigar =
      if (nCigar == 0) "*"
      else {
        val sb = new java.lang.StringBuilder(nCigar * 4)
        var i = 0
        while (i < nCigar) {
          val op = b.getInt
          sb.append(op >>> 4).append(CigarOps.charAt(op & 0xf))
          i += 1
        }
        sb.toString
      }
    val seqBytes = new Array[Byte]((lSeq + 1) / 2); b.get(seqBytes)
    val seq =
      if (lSeq == 0) None
      else {
        val cs = new Array[Char](lSeq)
        var i = 0
        while (i < lSeq) {
          val byte = seqBytes(i >> 1)
          cs(i) = SeqCode.charAt(
            if ((i & 1) == 0) (byte >> 4) & 0xf else byte & 0xf)
          i += 1
        }
        Some(new String(cs))
      }
    val qualBytes = new Array[Byte](lSeq); b.get(qualBytes)
    val qual = {
      var allMissing = lSeq > 0
      var i = 0
      while (allMissing && i < lSeq) {
        if (qualBytes(i) != -1) allMissing = false
        i += 1
      }
      if (lSeq == 0 || allMissing) None
      else {
        val cs = new Array[Char](lSeq)
        var j = 0
        while (j < lSeq) { cs(j) = (qualBytes(j) + 33).toChar; j += 1 }
        Some(new String(cs))
      }
    }
    val tags = scala.collection.mutable.ArrayBuffer[String]()
    while (b.hasRemaining) tags += decodeTag(b)
    BamRec(
      qname, flag,
      if (refId < 0) None else Some(refs(refId)),
      if (pos0 < 0) None else Some(pos0 + 1L),
      mapq, cigar,
      if (nextRefId < 0) None
      else if (nextRefId == refId) Some("=")
      else Some(refs(nextRefId)),
      if (nextPos0 < 0) None else Some(nextPos0 + 1L),
      tlen.toLong, seq, qual,
      if (tags.isEmpty) None else Some(tags.mkString(",")))
  }

  private def zString(b: ByteBuffer): String = {
    val sb = new StringBuilder
    var c = b.get
    while (c != 0) { sb += c.toChar; c = b.get }
    sb.toString
  }

  private def decodeTag(b: ByteBuffer): String = {
    val tag = "" + b.get.toChar + b.get.toChar
    def one(t: Char): String = t match {
      case 'A' => b.get.toChar.toString
      case 'c' => b.get.toString
      case 'C' => (b.get & 0xff).toString
      case 's' => b.getShort.toString
      case 'S' => (b.getShort & 0xffff).toString
      case 'i' => b.getInt.toString
      case 'I' => (b.getInt & 0xffffffffL).toString
      case 'f' => b.getFloat.toString
    }
    b.get.toChar match {
      case 'Z' => s"$tag:Z:${zString(b)}"
      case 'H' => s"$tag:H:${zString(b)}"
      case 'B' =>
        val sub = b.get.toChar
        val n = b.getInt
        val vals = (0 until n).map(_ => one(sub))
        s"$tag:B:$sub,${vals.mkString(",")}"
      case 'f' => s"$tag:f:${one('f')}"
      case 'A' => s"$tag:A:${one('A')}"
      case t => s"$tag:i:${one(t)}" // every int width prints as SAM 'i'
    }
  }

  // ------------------------------------------------------------- write
  /** The 12 write-side columns, in [[rowRecord]]'s positional order. */
  private val WriteCols = Seq("qname", "flag", "rname", "pos", "mapq",
    "cigar", "rnext", "pnext", "tlen", "seq", "qual", "tags")

  /** Header block: magic + SAM text + reference dictionary. */
  private def headerBytes(refs: Seq[(String, Long)]): Array[Byte] = {
    val text = ("@HD\tVN:1.6\tSO:coordinate\n" +
      refs.map { case (n, l) => s"@SQ\tSN:$n\tLN:$l\n" }.mkString)
      .getBytes("US-ASCII")
    val hdr = new ByteArrayOutputStream()
    hdr.write(Array[Byte]('B', 'A', 'M', 1))
    writeLe32(hdr, text.length)
    hdr.write(text)
    writeLe32(hdr, refs.length)
    refs.foreach { case (n, l) =>
      val nb = n.getBytes("US-ASCII")
      writeLe32(hdr, nb.length + 1)
      hdr.write(nb); hdr.write(0)
      writeLe32(hdr, l.toInt)
    }
    hdr.toByteArray
  }

  /** One [[WriteCols]]-shaped row -> its length-prefixed BAM record. */
  private def rowRecord(r: org.apache.spark.sql.Row,
                        refIdx: Map[String, Int]): Array[Byte] =
    encodeRecord(
      r.getString(0), r.getInt(1),
      Option(r.getString(2)),
      if (r.isNullAt(3)) None else Some(r.getLong(3)),
      r.getInt(4), r.getString(5),
      Option(r.getString(6)),
      if (r.isNullAt(7)) None else Some(r.getLong(7)),
      r.getLong(8),
      Option(r.getString(9)), Option(r.getString(10)),
      Option(r.getString(11)), refIdx)

  /** Serialize parsed reads (the [[Sam.read]] column shape; extra
    * columns ignored) to one BAM file at `path` — the fixture/test-scale
    * single-file writer (record order = input order, so feed it
    * coordinate-sorted rows for a spec-conformant file; rows collect to
    * the driver, so use [[writeSharded]] beyond fixture scale).
    *
    * `blockSize` caps UNCOMPRESSED bytes per BGZF member (default
    * 0xff00, bgzf's own cap); records larger than the cap get a member
    * to themselves (records may legally span members).
    */
  def write(reads: DataFrame, refs: Seq[(String, Long)], path: String,
            blockSize: Int = 0xff00): Unit = {
    val refIdx = refs.map(_._1).zipWithIndex.toMap
    val rows = reads.selectExpr(WriteCols: _*).collect()
    val body = new ByteArrayOutputStream()
    body.write(headerBytes(refs))
    rows.foreach(r => body.write(rowRecord(r, refIdx)))
    // BGZF-wrap the stream in <= blockSize uncompressed chunks + EOF
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      Bgzf.compress(body.toByteArray, blockSize))
  }

  /** The scale-path BAM sink: one complete, independently valid BAM
    * file per input partition, written BY the executors — nothing ever
    * collects to the driver, and per-task memory is O(blockSize)
    * ([[Bgzf.BlockWriter]] streams each record straight into deflated
    * members). The caller controls shard count/content via the frame's
    * partitioning (repartition by sample, sortWithinPartitions by
    * coordinate, ...) — the [[Vcf.writeVariants]] contract applied to
    * the binary container. Every shard carries the same header and its
    * own EOF member, so the directory reads back through [[read]] /
    * [[readSplit]] unchanged, and shards also concatenate into one
    * legal BGZF stream. Shards commit by atomic rename from
    * attempt-scoped temps ([[Bgzf.writeShards]]), so task retries AND
    * concurrent attempts (speculation, zombies after a stage retry)
    * are safe. Empty partitions still write a header+EOF shard
    * (valid empty BAM) so the layout is deterministic.
    */
  def writeSharded(reads: DataFrame, refs: Seq[(String, Long)],
                   dir: String, blockSize: Int = 0xff00,
                   index: Boolean = false): Unit = {
    val refIdx = refs.map(_._1).zipWithIndex.toMap
    Bgzf.writeShards(reads.selectExpr(WriteCols: _*).rdd, dir, ".bam",
      headerBytes(refs), blockSize)(r => rowRecord(r, refIdx))
    // index = true writes one .bai per shard (distributed); requires
    // each shard coordinate-sorted (the writeIndex sortedness guard
    // throws loudly otherwise) — sortWithinPartitions by (rname rank,
    // pos) before calling, the same contract region read-back needs
    if (index) Tabix.forEachFile(reads.sparkSession, dir)(writeIndex)
  }

  /** The spec's fixed 28-byte empty-member EOF marker (SAM spec §4.1.2).
    */
  private[graft] def BgzfEof: Array[Byte] = Bgzf.Eof

  private[graft] def writeBgzfMember(out: ByteArrayOutputStream,
                                     data: Array[Byte], off: Int,
                                     len: Int): Unit =
    Bgzf.writeMember(out, data, off, len)

  private def writeLe32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  /** SAM-spec reg2bin over a 0-based half-open interval. */
  private[graft] def reg2bin(beg: Int, end: Int): Int = {
    val e = end - 1
    if (beg >> 14 == e >> 14) ((1 << 15) - 1) / 7 + (beg >> 14)
    else if (beg >> 17 == e >> 17) ((1 << 12) - 1) / 7 + (beg >> 17)
    else if (beg >> 20 == e >> 20) ((1 << 9) - 1) / 7 + (beg >> 20)
    else if (beg >> 23 == e >> 23) ((1 << 6) - 1) / 7 + (beg >> 23)
    else if (beg >> 26 == e >> 26) ((1 << 3) - 1) / 7 + (beg >> 26)
    else 0
  }

  private val CigarTok = "(\\d+)([MIDNSHP=X])".r

  private def encodeRecord(qname: String, flag: Int, rname: Option[String],
                           pos: Option[Long], mapq: Int, cigar: String,
                           rnext: Option[String], pnext: Option[Long],
                           tlen: Long, seq: Option[String],
                           qual: Option[String], tags: Option[String],
                           refIdx: Map[String, Int]): Array[Byte] = {
    val refId = rname.map(refIdx).getOrElse(-1)
    val pos0 = pos.map(_.toInt - 1).getOrElse(-1)
    val cigarOps: Seq[(Int, Char)] =
      if (cigar == null || cigar == "*") Nil
      else CigarTok.findAllMatchIn(cigar)
        .map(m => (m.group(1).toInt, m.group(2).head)).toSeq
    val refLen = cigarOps.collect {
      case (n, op) if "MDN=X".indexOf(op) >= 0 => n
    }.sum
    val sq = seq.getOrElse("")
    val bin =
      if (pos0 < 0) 0
      else reg2bin(pos0, pos0 + math.max(refLen, 1))
    val nextRefId = rnext match {
      case Some("=") => refId
      case Some(n) => refIdx(n)
      case None => -1
    }
    val b = new ByteArrayOutputStream()
    def le32(v: Int): Unit = writeLe32(b, v)
    def le16(v: Int): Unit = { b.write(v & 0xff); b.write((v >> 8) & 0xff) }
    le32(refId); le32(pos0)
    b.write(qname.length + 1); b.write(mapq)
    le16(bin); le16(cigarOps.length); le16(flag)
    le32(sq.length)
    le32(nextRefId); le32(pnext.map(_.toInt - 1).getOrElse(-1))
    le32(tlen.toInt)
    b.write(qname.getBytes("US-ASCII")); b.write(0)
    cigarOps.foreach { case (n, op) =>
      le32((n << 4) | CigarOps.indexOf(op))
    }
    var i = 0
    while (i < sq.length) {
      val hi = SeqCode.indexOf(sq.charAt(i).toUpper) max 0
      val lo = if (i + 1 < sq.length)
        SeqCode.indexOf(sq.charAt(i + 1).toUpper) max 0 else 0
      b.write((hi << 4) | lo)
      i += 2
    }
    qual match {
      case Some(q) => q.foreach(c => b.write(c - 33))
      case None => (0 until sq.length).foreach(_ => b.write(0xff))
    }
    tags.foreach(t => splitTags(t).foreach(encodeTag(b, _)))
    val rec = b.toByteArray
    val out = new ByteArrayOutputStream(rec.length + 4)
    writeLe32(out, rec.length)
    out.write(rec)
    out.toByteArray
  }

  /** Split the ','-joined tags string back into TAG:TYPE:VALUE entries;
    * a segment not starting a new `XX:T:` entry belongs to the previous
    * one (B-array values and commas inside Z strings).
    */
  private[graft] def splitTags(s: String): Seq[String] = {
    val entry = "^[A-Za-z][A-Za-z0-9]:[AcCsSiIfZHB]:".r
    s.split(",").foldLeft(List.empty[String]) { (acc, seg) =>
      if (entry.findFirstIn(seg).isDefined || acc.isEmpty) seg :: acc
      else (acc.head + "," + seg) :: acc.tail
    }.reverse
  }

  private def encodeTag(b: ByteArrayOutputStream, t: String): Unit = {
    val tag = t.substring(0, 2)
    val typ = t.charAt(3)
    val value = t.substring(5)
    b.write(tag.charAt(0)); b.write(tag.charAt(1))
    def le32(v: Int): Unit = writeLe32(b, v)
    typ match {
      case 'i' => b.write('i'); le32(value.toLong.toInt)
      case 'A' => b.write('A'); b.write(value.charAt(0))
      case 'f' =>
        b.write('f')
        le32(java.lang.Float.floatToIntBits(value.toFloat))
      case 'Z' | 'H' =>
        b.write(typ); b.write(value.getBytes("US-ASCII")); b.write(0)
      case 'B' =>
        b.write('B')
        val parts = value.split(",")
        val sub = parts(0).charAt(0)
        b.write(sub)
        le32(parts.length - 1)
        parts.drop(1).foreach { v =>
          sub match {
            case 'c' | 'C' => b.write(v.toInt & 0xff)
            case 's' | 'S' =>
              val x = v.toInt; b.write(x & 0xff); b.write((x >> 8) & 0xff)
            case 'i' | 'I' => le32(v.toLong.toInt)
            case 'f' => le32(java.lang.Float.floatToIntBits(v.toFloat))
          }
        }
      case other => sys.error(s"unsupported SAM tag type '$other' in $t")
    }
  }
}
