package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.GZIPInputStream

/** Tabix (`.tbi`) index support for sorted BGZF VCF — read, write, and
  * region query (the tabix paper + SAM spec's binning scheme; no
  * external libs).
  *
  * The engine's index-free bisection stays the default ([[Vcf
  * .readRegion]]'s O(log members) probes), but real cohort data ships
  * with sidecar indexes, and when one is present the planner should
  * use it: ZERO probe reads (the index IS the plan) and EXACT spans —
  * the index bins records by their full (beg, end = pos + len(ref) -
  * 1) intervals, so a REF allele longer than the bisection's `maxSpan`
  * back-off is still found (the one documented divergence class of the
  * probe path). A queried chrom absent from the index's name table
  * cannot have records in the file, so it prunes to nothing exactly —
  * the text-header fallback class disappears on indexed files.
  *
  * Binning: the 5-level R-tree of the SAM spec (§5.3, min_shift 14,
  * depth 5 — bins 0, 1-8, 9-72, 73-584, 585-4680, 4681-37448), plus
  * the 16 kb linear index that floors each query's chunk list.
  * Virtual file offsets pack (memberStart << 16 | intraMemberOffset).
  *
  * Chunk → byte window: our range readers own every line whose FIRST
  * byte inflates from a member starting inside the window
  * ([[Bgzf]] rangeLines), so a chunk ((cb,ub),(ce,ue)) maps to the
  * member-granular superset `[cb, ce + (ue>0 ? 1 : 0))` — overhang
  * rows are invisible behind the re-applied filters, exactly like the
  * bisection's member-boundary overhang. [[Bgzf.mergeWindows]]
  * coalesces adjacent chunks' windows so no byte reads twice.
  *
  * The writer ([[indexVcfGz]]) builds the standard VCF-preset index
  * (format 2, seq col 1, beg col 2, meta '#') in ONE streaming pass —
  * the `tabix -p vcf` operation — so graft's own [[Vcf.writeSharded]]
  * output (or any sorted `.vcf.gz` it receives) can be indexed
  * in place, per shard, executor-side ([[indexAll]]). A stale sidecar
  * (older mtime than its data file) is ignored with a stderr warning —
  * reading one silently returns wrong rows, the worst failure class.
  *
  * Reference anchor: the reference pipeline consumes exactly this
  * layout (per-chrom `.vcf.gz` + `.tbi`, /root/reference/Snakefile).
  */
object Tabix {

  /** One chunk of records: packed virtual offsets [beg, end). */
  private[sources] case class Chunk(beg: Long, end: Long)

  /** One reference sequence's share of the index. */
  private[sources] case class RefIndex(
      bins: Map[Int, Seq[Chunk]], linear: Array[Long])

  /** A parsed `.tbi`: contig names in ref-id order + per-ref bins. */
  private[sources] case class Index(names: Seq[String],
                                    refs: IndexedSeq[RefIndex]) {
    lazy val nameToId: Map[String, Int] = names.zipWithIndex.toMap
  }

  private def coff(v: Long): Long = v >>> 16
  private def uoff(v: Long): Int = (v & 0xffff).toInt
  private def pack(c: Long, u: Int): Long = (c << 16) | (u & 0xffffL)

  // ------------------------------------------------------ binning

  /** SAM spec §5.3 reg2bin over a 0-based half-open [beg, end). */
  private[sources] def reg2bin(beg: Long, end0: Long): Int = {
    val e = math.max(beg, end0 - 1)
    if (beg >> 14 == e >> 14) (((1 << 15) - 1) / 7 + (beg >> 14)).toInt
    else if (beg >> 17 == e >> 17) (((1 << 12) - 1) / 7 + (beg >> 17)).toInt
    else if (beg >> 20 == e >> 20) (((1 << 9) - 1) / 7 + (beg >> 20)).toInt
    else if (beg >> 23 == e >> 23) (((1 << 6) - 1) / 7 + (beg >> 23)).toInt
    else if (beg >> 26 == e >> 26) (((1 << 3) - 1) / 7 + (beg >> 26)).toInt
    else 0
  }

  /** All bins overlapping 0-based half-open [beg, end). */
  private[sources] def reg2bins(beg: Long, end0: Long): Seq[Int] = {
    val e = math.max(beg, end0 - 1)
    val out = Seq.newBuilder[Int]
    out += 0
    var k = 1 + (beg >> 26); while (k <= 1 + (e >> 26)) { out += k.toInt; k += 1 }
    k = 9 + (beg >> 23); while (k <= 9 + (e >> 23)) { out += k.toInt; k += 1 }
    k = 73 + (beg >> 20); while (k <= 73 + (e >> 20)) { out += k.toInt; k += 1 }
    k = 585 + (beg >> 17); while (k <= 585 + (e >> 17)) { out += k.toInt; k += 1 }
    k = 4681 + (beg >> 14); while (k <= 4681 + (e >> 14)) { out += k.toInt; k += 1 }
    out.result()
  }

  // ------------------------------------------------------ reading

  /** Parse a `.tbi` sidecar (BGZF-wrapped, little-endian). */
  private[sources] def readTbi(
      conf: org.apache.hadoop.conf.Configuration,
      idxPath: String): Index = {
    val p = new org.apache.hadoop.fs.Path(idxPath)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    val raw =
      try new GZIPInputStream(in).readAllBytes()
      finally in.close()
    val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); b.get(magic)
    require(magic.sameElements("TBI".getBytes("ISO-8859-1")),
      s"$idxPath: not a tabix index")
    val nRef = b.getInt
    b.getInt // format (2 = VCF; generic presets parse identically)
    b.getInt; b.getInt; b.getInt // col_seq, col_beg, col_end
    b.getInt // meta
    b.getInt // skip
    val lNm = b.getInt
    val nm = new Array[Byte](lNm); b.get(nm)
    val names = new String(nm, "UTF-8").split("\u0000", -1).toSeq
      .filter(_.nonEmpty)
    require(names.size == nRef,
      s"$idxPath: $nRef refs but ${names.size} names")
    val refs = (0 until nRef).map { _ =>
      val nBin = b.getInt
      val bins = (0 until nBin).map { _ =>
        val bin = b.getInt
        val nChunk = b.getInt
        bin -> (0 until nChunk).map(_ => Chunk(b.getLong, b.getLong))
      }.toMap
      val nIntv = b.getInt
      val linear = Array.fill(nIntv)(b.getLong)
      RefIndex(bins, linear)
    }
    Index(names, refs)
  }

  /** Merged chunk list for 1-based inclusive `chrom:start-end` — empty
    * when the chrom has no records. Chunks whose end sits at or before
    * the linear index's floor for the query's first 16 kb window
    * cannot contain overlapping records and drop out.
    */
  private[sources] def queryChunks(idx: Index, chrom: String,
                                   start: Long, end: Long): Seq[Chunk] =
    idx.nameToId.get(chrom) match {
      case None => Seq.empty
      case Some(rid) =>
        val ref = idx.refs(rid)
        val beg0 = math.max(0L, start - 1)
        val end0 = math.max(beg0 + 1, end)
        val w = (beg0 >> 14).toInt
        val minOff =
          if (w < ref.linear.length) ref.linear(w) else
            ref.linear.lastOption.getOrElse(0L)
        val raw = reg2bins(beg0, end0)
          .flatMap(ref.bins.get).flatten
          .filter(c => c.end > minOff)
          .sortBy(_.beg)
        // coalesce overlapping/adjacent chunks
        raw.foldLeft(List.empty[Chunk]) { (acc, c) =>
          acc match {
            case h :: t if c.beg <= h.end =>
              h.copy(end = math.max(h.end, c.end)) :: t
            case _ => c :: acc
          }
        }.reverse
    }

  /** [[queryChunks]] rendered as the planner's member-granular byte
    * windows (probes = 0 — the index replaces the bisection).
    */
  private[sources] def queryWindows(idx: Index, fp: String, len: Long,
      regions: Seq[(String, Long, Long)]): Seq[Bgzf.FileWindow] =
    regions.flatMap { case (chrom, start, end) =>
      queryChunks(idx, chrom, start, end).map { c =>
        val to = coff(c.end) + (if (uoff(c.end) > 0) 1L else 0L)
        Bgzf.FileWindow(fp, len, coff(c.beg), math.min(to, len), 0)
      }
    }

  /** The usable sidecar index of `fp`, if any: present AND at least as
    * new as the data (a stale index silently returns wrong rows — the
    * worst failure class — so it is ignored loudly and the caller
    * falls back to the bisection).
    */
  private[sources] def sidecar(
      conf: org.apache.hadoop.conf.Configuration,
      fp: String): Option[Index] = {
    val ip = new org.apache.hadoop.fs.Path(fp + ".tbi")
    val fs = ip.getFileSystem(conf)
    if (!fs.exists(ip)) None
    else {
      val dataMtime = fs.getFileStatus(
        new org.apache.hadoop.fs.Path(fp)).getModificationTime
      if (fs.getFileStatus(ip).getModificationTime < dataMtime) {
        System.err.println(s"[graft] ignoring stale index $ip " +
          "(older than its data file) — falling back to bisection")
        None
      } else
        try Some(readTbi(conf, fp + ".tbi"))
        catch { case e: Exception =>
          System.err.println(s"[graft] unreadable index $ip ($e) — " +
            "falling back to bisection")
          None
        }
    }
  }

  // ------------------------------------------------------ writing

  /** Build `path.tbi` for a coordinate-sorted bgzipped VCF in one
    * streaming pass (`tabix -p vcf` — VCF preset: seq col 1, beg col
    * 2, end = pos + len(ref) - 1, meta '#'). Ref ids are assigned in
    * order of first appearance (the tabix rule); unsorted input throws
    * (an index over unsorted data would silently drop rows at query
    * time). Positions must stay under the 5-level scheme's 2^29 cap.
    */
  def indexVcfGz(conf: org.apache.hadoop.conf.Configuration,
                 path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    val names = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val bins = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.LinkedHashMap[
        Int, scala.collection.mutable.ArrayBuffer[Chunk]]]
    val linear = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[Long]]
    var lastRef = -1
    var lastBeg = -1L
    try {
      // member walk with a cross-member line carry: every line knows
      // the virtual offset of its first byte
      var memberOff = 0L
      val carry = new ByteArrayOutputStream()
      var carryV = -1L
      def record(line: String, begV: Long, endV: Long): Unit = {
        if (line.isEmpty || line.charAt(0) == '#') return
        val t1 = line.indexOf('\t'); if (t1 < 0) return
        val t2 = line.indexOf('\t', t1 + 1); if (t2 < 0) return
        val t3 = line.indexOf('\t', t2 + 1)
        val t4 = if (t3 < 0) -1 else line.indexOf('\t', t3 + 1)
        val chrom = line.substring(0, t1)
        val pos = line.substring(t1 + 1, t2).toLongOption.getOrElse(-1L)
        if (pos < 0) return
        val refLen =
          if (t3 < 0) 1L
          else (if (t4 < 0) line.length - t3 - 1 else t4 - t3 - 1).toLong
        val beg0 = math.max(0L, pos - 1)
        val end0 = math.max(beg0 + 1, beg0 + math.max(1L, refLen))
        require(end0 <= (1L << 29),
          s"$path: position $pos + REF spans past the tabix 512Mb cap")
        val rid = names.getOrElseUpdate(chrom, {
          bins += scala.collection.mutable.LinkedHashMap.empty
          linear += scala.collection.mutable.ArrayBuffer.empty
          names.size
        })
        require(rid > lastRef ||
          (rid == lastRef && beg0 >= lastBeg),
          s"$path is not coordinate-sorted at $chrom:$pos — " +
            "sort before indexing")
        require(rid >= lastRef,
          s"$path: chromosome block $chrom reappears at pos $pos — " +
            "sort before indexing")
        lastRef = rid; lastBeg = beg0
        val bin = reg2bin(beg0, end0)
        val bs = bins(rid).getOrElseUpdate(bin,
          scala.collection.mutable.ArrayBuffer.empty)
        if (bs.nonEmpty && bs.last.end == begV)
          bs(bs.size - 1) = bs.last.copy(end = endV)
        else bs += Chunk(begV, endV)
        val lin = linear(rid)
        var w = (beg0 >> 14).toInt
        val wEnd = ((end0 - 1) >> 14).toInt
        while (w <= wEnd) {
          while (lin.size <= w) lin += 0L
          if (lin(w) == 0L || begV < lin(w)) lin(w) = begV
          w += 1
        }
      }
      while (memberOff < len) {
        val hdr = new Array[Byte](18)
        in.readFully(memberOff, hdr, 0, 18)
        require(hdr(0) == 0x1f.toByte && hdr(1) == 0x8b.toByte &&
          hdr(12) == 0x42 && hdr(13) == 0x43,
          s"not a BGZF member at offset $memberOff of $path")
        val bs = ((hdr(16) & 0xff) | ((hdr(17) & 0xff) << 8)) + 1
        val member = new Array[Byte](bs)
        in.readFully(memberOff, member, 0, bs)
        val inflated = new GZIPInputStream(
          new java.io.ByteArrayInputStream(member)).readAllBytes()
        var i = 0
        while (i < inflated.length) {
          val nl = inflated.indexOf('\n'.toByte, i)
          if (nl < 0) {
            if (carry.size() == 0) carryV = pack(memberOff, i)
            carry.write(inflated, i, inflated.length - i)
            i = inflated.length
          } else {
            val begV =
              if (carry.size() > 0) carryV else pack(memberOff, i)
            carry.write(inflated, i, nl - i)
            var lineBytes = carry.toByteArray
            carry.reset(); carryV = -1L
            if (lineBytes.nonEmpty &&
              lineBytes(lineBytes.length - 1) == '\r')
              lineBytes = java.util.Arrays.copyOf(
                lineBytes, lineBytes.length - 1)
            record(new String(lineBytes,
              java.nio.charset.StandardCharsets.UTF_8),
              begV, pack(memberOff, nl + 1))
            i = nl + 1
          }
        }
        memberOff += bs
      }
      require(carry.size() == 0,
        s"$path: trailing unterminated line — truncated file?")
    } finally in.close()
    // ---- serialize (little-endian) + BGZF-wrap
    val body = new ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      body.write(v & 0xff); body.write((v >> 8) & 0xff)
      body.write((v >> 16) & 0xff); body.write((v >> 24) & 0xff)
    }
    def le64(v: Long): Unit = { le32(v.toInt); le32((v >> 32).toInt) }
    body.write("TBI".getBytes("ISO-8859-1"))
    le32(names.size)
    le32(2) // format: VCF preset
    le32(1); le32(2); le32(0) // col_seq, col_beg, col_end (VCF rule)
    le32('#'.toInt)
    le32(0) // skip
    val nmBytes = names.keys.map(_ + "\u0000").mkString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    le32(nmBytes.length)
    body.write(nmBytes)
    names.values.foreach { rid =>
      val bm = bins(rid)
      le32(bm.size)
      bm.foreach { case (bin, chunks) =>
        le32(bin)
        le32(chunks.size)
        chunks.foreach { c => le64(c.beg); le64(c.end) }
      }
      val lin = linear(rid)
      // backfill empty 16 kb windows with the previous floor (the
      // htslib save rule) so any window lookup has a usable bound
      var prev = 0L
      var i = 0
      while (i < lin.size) {
        if (lin(i) == 0L) lin(i) = prev else prev = lin(i)
        i += 1
      }
      le32(lin.size)
      lin.foreach(le64)
    }
    val outP = new org.apache.hadoop.fs.Path(path + ".tbi")
    val os = fs.create(outP, true)
    try os.write(Bgzf.compress(body.toByteArray))
    finally os.close()
  }

  /** Index every resolved file of a path/directory/glob — one Spark
    * task per shard (executor-side, like the sharded sinks), so a
    * 1000-shard fleet indexes in one pass. Single files index inline.
    */
  def indexAll(spark: org.apache.spark.sql.SparkSession,
               path: String): Unit = {
    val files = Bgzf.resolveFiles(spark, path)
      .map(_._1).filterNot(_.endsWith(".tbi"))
    if (files.size <= 1)
      files.foreach(f =>
        indexVcfGz(spark.sparkContext.hadoopConfiguration, f))
    else {
      val hconf = new org.apache.spark.SerializableWritable(
        new org.apache.hadoop.conf.Configuration(
          spark.sparkContext.hadoopConfiguration))
      spark.sparkContext.parallelize(files, files.size)
        .foreach(f => indexVcfGz(hconf.value, f))
    }
  }
}
