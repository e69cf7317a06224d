package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (ISO 28500) source — the container format web crawls (Common
  * Crawl et al.) arrive in, i.e. the first stage of every web-scale
  * training-data pipeline.
  *
  * Spark-first design: a WARC file is a concatenation of records, each
  * `WARC/1.0\r\n<headers>\r\n\r\n<payload>\r\n\r\n`. Reading with
  * `lineSep = "\r\n\r\nWARC/1.0\r\n"` makes the scan SPLITTABLE — an HDFS
  * block boundary lands mid-record and the reader scans forward to the
  * next separator, exactly like plain line splitting — so one 1 GB WARC
  * parallelizes across tasks and a crawl's ~64k files across executors,
  * with no whole-file buffering. Header fields and the Content-Length
  * payload trim are native codegen'd expressions.
  *
  * Honesty note: a payload that itself contains the byte sequence
  * `\r\n\r\nWARC/1.0\r\n` would split early (the same caveat every
  * boundary-scan WARC reader carries); the affected record surfaces with
  * `truncated = true` rather than silently, because its body comes up
  * short of Content-Length. Gzipped crawls (`.warc.gz`) decompress
  * through Hadoop's codec before the same splitter; compressed files
  * parallelize per-file rather than per-block.
  */
object Warc {

  private val Boundary = "\r\n\r\nWARC/1.0\r\n"

  private def header(block: Column, name: String): Column =
    nullif(regexp_extract(block, s"(?m)^$name: ?([^\r\n]*)", 1), lit(""))

  /** One row per WARC record: header fields, Content-Length-trimmed
    * payload, and a `truncated` flag when the stored body is shorter
    * than Content-Length declares (truncated capture or split collision).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", Boundary).text(path)
    // only the file's first record keeps its "WARC/1.0\r\n" prefix — the
    // separator consumes it for every later record. Header lookups run
    // against the whole record but (?m)^ + first-match means the WARC
    // header block always wins over same-named HTTP payload headers.
    parseRecords(raw)
  }

  /** Parse raw record strings (column `value`, leading `WARC/1.0\r\n`
    * optional, trailing separator blank lines tolerated) into the
    * standard record schema — shared by the splittable text scan
    * ([[read]]) and the per-member gzip scan ([[readGz]]).
    */
  private[graft] def parseRecords(raw: DataFrame): DataFrame = {
    raw
      .where(length(trim(col("value"))) > 0)
      .select(regexp_replace(col("value"),
        "^WARC/1\\.0\r\n", "").as("rec"))
      .withColumn("hdr", substring_index(col("rec"), "\r\n\r\n", 1))
      .withColumn("body", when(instr(col("rec"), "\r\n\r\n") > 0,
        col("rec").substr(length(col("hdr")) + 5, length(col("rec"))))
        .otherwise(lit("")))
      .withColumn("content_length",
        // digit-guarded (sources.Casts): a malformed Content-Length in a
        // crawl must yield null, not an ANSI cast failure — and pushed-
        // down inferred predicates can evaluate this anywhere
        Casts.tryLong(header(col("rec"), "Content-Length")))
      .select(
        header(col("rec"), "WARC-Type").as("warc_type"),
        header(col("rec"), "WARC-Record-ID").as("record_id"),
        header(col("rec"), "WARC-Date").as("warc_date"),
        header(col("rec"), "WARC-Target-URI").as("target_uri"),
        header(col("rec"), "Content-Type").as("content_type"),
        col("content_length"),
        when(col("content_length").isNotNull,
          col("body").substr(lit(1), col("content_length")))
          .otherwise(col("body")).as("payload"),
        (col("content_length").isNotNull &&
          length(col("body")) < col("content_length")).as("truncated"))
  }

  // ------------------------------------------- splittable .warc.gz
  /** Splittable read of record-compressed crawls — the layout Common
    * Crawl actually ships: ONE PLAIN GZIP MEMBER PER RECORD, so member
    * boundaries ARE record boundaries and a byte-range task can own
    * exactly the members that start inside its range (no cross-range
    * line/record stitching at all — simpler than the BGZF text case).
    * Plain gzip members carry no BSIZE, so a range anchors itself by
    * scanning for the 3-byte gzip magic (+ zero reserved FLG bits) and
    * VALIDATING each candidate by inflating its first bytes and
    * requiring the `WARC/1.0` record prefix — 64 bits of checked
    * plaintext on top of the header filter, so a payload collision
    * mis-anchoring a split is ~2^-64 per candidate. After the anchor,
    * members chain exactly (header parse + Inflater bytes-consumed +
    * 8-byte trailer), no further scanning.
    *
    * A member inflating to several records (spec-legal, rare) re-splits
    * on the record boundary — same rule as the text scan. Multi-GB
    * members can't happen in this layout (a member is one record), so
    * the per-member buffering is record-sized, the same memory bound
    * the text path's one-record-per-row already implies.
    */
  def readGz(spark: SparkSession, path: String,
             splitSize: Long = 32L << 20): DataFrame = {
    val members = gzMembers(spark, path, splitSize)
    parseRecords(members
      // each member stores its record(s) INCLUDING the trailing
      // blank-line separator; the text path's lineSep consumes those,
      // so strip exactly one from the member tail for byte parity
      // (visible on truncated-capture records, where no Content-Length
      // trim hides it) — EXCEPT the file's final member, whose tail
      // blank lines the text reader keeps (nothing follows to separate)
      .select(when(col("last"), col("member"))
        .otherwise(regexp_replace(col("member"), "\r\n\r\n$", ""))
        .as("member"))
      .select(posexplode(split(col("member"),
        "\r\n\r\nWARC/1\\.0\r\n")).as(Seq("p", "value")))
      .select(when(col("p") === 0, col("value"))
        .otherwise(concat(lit("WARC/1.0\r\n"), col("value")))
        .as("value")))
  }

  /** One row per gzip member (inflated, UTF-8) plus a `last` flag on
    * the file's final member: the range-scan layer of [[readGz]],
    * exposed for specs.
    */
  private[graft] def gzMembers(spark: SparkSession, path: String,
                               splitSize: Long): DataFrame = {
    val sc = spark.sparkContext
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(sc.hadoopConfiguration)
    val files = (fs.globStatus(p) match {
      case null | Array() => Array(fs.getFileStatus(p))
      case hits => hits
    }).flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).filter(s =>
          s.isFile && !Bgzf.isHiddenName(s.getPath.getName))
      else Array(st)
    }
    case class R(path: String, start: Long, end: Long, len: Long)
    val ranges = files.flatMap { st =>
      val len = st.getLen
      val n = math.max(1L, (len + splitSize - 1) / splitSize)
      (0L until n).map(i => R(st.getPath.toString, i * splitSize,
        math.min((i + 1) * splitSize, len), len))
    }.toSeq
    val hconf = new org.apache.spark.SerializableWritable(
      new org.apache.hadoop.conf.Configuration(sc.hadoopConfiguration))
    val rows = sc.parallelize(ranges, math.max(1, ranges.size))
      .flatMap { r =>
        val rp = new org.apache.hadoop.fs.Path(r.path)
        val in = rp.getFileSystem(hconf.value).open(rp)
        Bgzf.closeOnTaskEnd(in)
        gzRangeMembers(in, r.start, r.end, r.len)
      }
    spark.createDataFrame(
      rows.map(m => org.apache.spark.sql.Row(m._1, m._2)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("member",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("last",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  private def pread(in: org.apache.hadoop.fs.FSDataInputStream,
                    off: Long, n: Int, len: Long): Array[Byte] = {
    val m = math.min(n.toLong, len - off).toInt
    if (m <= 0) return Array.emptyByteArray
    val b = new Array[Byte](m)
    in.readFully(off, b, 0, m)
    b
  }

  /** A forward-moving cached read window, so walking thousands of tiny
    * members per range costs ONE sequential pass over the bytes instead
    * of a positioned read per member.
    */
  private class GzWindow(in: org.apache.hadoop.fs.FSDataInputStream,
                         len: Long) {
    private var buf: Array[Byte] = Array.emptyByteArray
    private var bufOff = 0L
    def bytes(off: Long, n: Int): Array[Byte] = {
      if (off < bufOff || off + n > bufOff + buf.length) {
        val want = math.max(n, 1 << 19)
        if (off >= bufOff && off < bufOff + buf.length) {
          // forward refill keeping the unconsumed tail
          val keepFrom = (off - bufOff).toInt
          val kept = java.util.Arrays.copyOfRange(buf, keepFrom, buf.length)
          val more = pread(in, bufOff + buf.length,
            math.max(want - kept.length, 1 << 19), len)
          buf = kept ++ more
          bufOff = off
        } else {
          buf = pread(in, off, want, len)
          bufOff = off
        }
      }
      val s = (off - bufOff).toInt
      java.util.Arrays.copyOfRange(buf, s,
        math.min(s.toLong + n, buf.length.toLong).toInt)
    }
  }

  /** Parse a gzip member header at `off`: returns the deflate-data
    * offset, or -1 when the bytes are not a plausible header. The probe
    * window starts at 1 KiB and GROWS when the header runs past it (a
    * long FNAME/FEXTRA is legal RFC-1952; capping would silently skip
    * the member during anchor scans and crash a mid-chain inflate) —
    * only an actual file end inside the header answers -1.
    */
  private def gzHeaderEnd(win: GzWindow, off: Long, len: Long): Long = {
    var cap = 1024
    while (true) {
      val hdr = win.bytes(off, cap)
      if (hdr.length < 10 || hdr(0) != 0x1f.toByte ||
        hdr(1) != 0x8b.toByte || hdr(2) != 0x08 ||
        (hdr(3) & 0xe0) != 0) return -1L
      val flg = hdr(3)
      var h = 10
      var truncated = false // header extends past this probe window
      if ((flg & 4) != 0) { // FEXTRA
        if (h + 2 > hdr.length) truncated = true
        else h += 2 + ((hdr(h) & 0xff) | ((hdr(h + 1) & 0xff) << 8))
      }
      def skipZ(): Unit = { // NUL-terminated FNAME / FCOMMENT
        while (!truncated && h < hdr.length && hdr(h) != 0) h += 1
        if (h >= hdr.length) truncated = true else h += 1
      }
      if ((flg & 8) != 0) skipZ()
      if ((flg & 16) != 0) skipZ()
      if ((flg & 2) != 0) h += 2 // FHCRC
      if (!truncated && h <= hdr.length) return off + h
      if (hdr.length < cap) return -1L // file ended inside the header
      // 1 MiB ceiling: far beyond any real FNAME/FEXTRA, and crawled
      // payload bytes are remote-controlled — an unbounded probe lets
      // a crafted magic + long NUL-free run force ever-larger window
      // copies per candidate offset (and cap *= 4 would eventually
      // overflow Int)
      if (cap >= (1 << 20)) return -1L
      cap *= 4
    }
    -1L // unreachable
  }

  /** Inflate the member at `off`; returns (text, nextMemberOffset). */
  private def inflateGzMember(win: GzWindow, off: Long,
                              len: Long): (String, Long) = {
    val dataOff = gzHeaderEnd(win, off, len)
    require(dataOff >= 0, s"not a gzip member at offset $off")
    val inf = new java.util.zip.Inflater(true)
    val out = new ByteArrayOutputStream(8192)
    val outBuf = new Array[Byte](65536)
    var fedEnd = dataOff
    while (!inf.finished()) {
      if (inf.needsInput()) {
        val chunk = win.bytes(fedEnd, 65536)
        require(chunk.nonEmpty, s"truncated gzip member at $off")
        inf.setInput(chunk)
        fedEnd += chunk.length
      }
      val n = inf.inflate(outBuf)
      if (n > 0) out.write(outBuf, 0, n)
    }
    val next = fedEnd - inf.getRemaining + 8 // CRC32 + ISIZE
    inf.end()
    (out.toString("UTF-8"), next)
  }

  /** True when the member at `off` inflates to a `WARC/1.0` prefix. */
  private def validWarcMember(win: GzWindow, off: Long,
                              len: Long): Boolean =
    try {
      val dataOff = gzHeaderEnd(win, off, len)
      if (dataOff < 0) return false
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(win.bytes(dataOff, 4096))
        val probe = new Array[Byte](8)
        var got = 0
        var n = 1
        while (got < 8 && n > 0) {
          n = inf.inflate(probe, got, 8 - got)
          got += n
        }
        got == 8 && new String(probe, "US-ASCII") == "WARC/1.0"
      } finally inf.end()
    } catch { case _: Throwable => false }

  /** Inflated members starting in [start, end): anchor by scan +
    * inflate-validation, then chain exactly.
    */
  private def gzRangeMembers(in: org.apache.hadoop.fs.FSDataInputStream,
                             start: Long, end: Long,
                             len: Long): Iterator[(String, Boolean)] = {
    val win = new GzWindow(in, len)
    var first = -1L
    if (start == 0L) first = 0L
    else {
      // chunked magic scan over the whole range (members can be any
      // size, so the first member start may be anywhere — or nowhere)
      var chunkStart = start
      while (first < 0 && chunkStart < end) {
        val cLen = math.min(1L << 20, end - chunkStart).toInt
        val scanBuf = pread(in, chunkStart, cLen + 3, len)
        var i = 0
        while (first < 0 && i + 3 <= scanBuf.length &&
          chunkStart + i < end) {
          if (scanBuf(i) == 0x1f.toByte &&
            scanBuf(i + 1) == 0x8b.toByte && scanBuf(i + 2) == 0x08 &&
            validWarcMember(win, chunkStart + i, len))
            first = chunkStart + i
          i += 1
        }
        chunkStart += cLen
      }
    }
    if (first < 0) { in.close(); return Iterator.empty }
    val firstOff = first
    new Iterator[(String, Boolean)] {
      private var off = firstOff
      override def hasNext: Boolean = {
        val more = off < end && off < len
        if (!more) in.close()
        more
      }
      override def next(): (String, Boolean) = {
        val (text, nextOff) = inflateGzMember(win, off, len)
        off = nextOff
        (text, nextOff >= len)
      }
    }
  }

  /** Re-encode raw WARC text as the Common Crawl layout — one plain
    * gzip member per record. Fixture/bench helper (the write side of
    * [[readGz]]); record boundaries follow the same separator grammar
    * as [[read]].
    */
  private[graft] def gzipPerRecord(warcText: String): Array[Byte] = {
    val parts = warcText.split("\r\n\r\nWARC/1\\.0\r\n")
    val out = new ByteArrayOutputStream(warcText.length / 2)
    parts.zipWithIndex.foreach { case (p, i) =>
      val raw = if (i == 0) p else "WARC/1.0\r\n" + p
      // intermediate parts lost their separator to the split — restore
      // it unconditionally (a record's declared content may itself end
      // with a blank line; the separator is ALWAYS additional). The
      // final part keeps the file tail verbatim.
      val rec = if (i == parts.length - 1) raw else raw + "\r\n\r\n"
      val gz = new java.util.zip.GZIPOutputStream(out)
      gz.write(rec.getBytes("UTF-8"))
      gz.finish()
    }
    out.toByteArray
  }

  /** HTTP status line code of a response payload (null for non-HTTP). */
  def httpStatus(payload: Column): Column =
    nullif(regexp_extract(payload, "^HTTP/1\\.[01] (\\d{3})", 1), lit(""))
      .cast("int")

  /** The entity body of an HTTP response payload (after its header
    * block); empty when the payload has no header/body split.
    */
  def httpBody(payload: Column): Column =
    when(instr(payload, "\r\n\r\n") > 0,
      payload.substr(
        length(substring_index(payload, "\r\n\r\n", 1)) + 5,
        length(payload)))
      .otherwise(lit(""))

  /** WET-style text extraction from an HTML body: drop script/style
    * blocks, strip tags, decode the common entities (&amp; LAST, so
    * double-escaped text stays escaped exactly once), collapse
    * whitespace. Pure regexp/replace columns — no UDF, and every regex
    * stays inside the RE2 subset so a SQL oracle can replay it.
    */
  /** Outlink hrefs from an HTML body — the web-graph edge extractor
    * (feeds the d11 PageRank / d16 URL-dedup path): every `<a ... href>`
    * value, quote style normalized (double/single/unquoted), fragment-
    * only links dropped (same-page anchors are not edges). Stays in the
    * RE2 subset (non-greedy attribute skip, character classes match
    * newlines) so the SQL oracle replays it; no HTML parser dependency —
    * the crawl-scale tradeoff every WET-style extractor makes.
    */
  def extractLinks(htmlBody: Column): Column =
    filter(
      transform(
        regexp_extract_all(htmlBody,
          lit("(?is)<a\\s[^>]*?href\\s*=\\s*('[^']*'|\"[^\"]*\"|[^\\s>]+)"),
          lit(1)),
        l => regexp_replace(l, "^['\"]|['\"]$", "")),
      l => length(l) > 0 && !l.startsWith("#"))

  /** Resolve an extracted href against its page's base URI — the step
    * between [[extractLinks]] and any graph/frontier consumer (relative
    * links are most links on most sites; an unresolved edge list
    * under-counts every intra-site edge). RFC 3986's common cases,
    * CASE-expressible so the SQL oracle replays it: scheme-qualified
    * hrefs pass through, `//host/...` adopts the base scheme, `/path`
    * roots at the base authority, anything else joins the base
    * directory; fragments strip first (same-page anchors are not
    * edges). Dot-segment normalization (`..`) is deliberately omitted —
    * crawl canonicalization (t21) owns URL normalization.
    */
  def resolveHref(base: Column, href: Column): Column = {
    val h = regexp_replace(href, "#.*$", "")
    val root = regexp_extract(base, "^(https?://[^/?#]+)", 1)
    val scheme = regexp_extract(base, "^(https?):", 1)
    val path = regexp_extract(base, "^https?://[^/?#]+([^?#]*)", 1)
    val dir = regexp_replace(
      when(path === "", lit("/")).otherwise(path), "[^/]*$", "")
    when(h.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*:"), h)
      .when(h.startsWith("//"), concat(scheme, lit(":"), h))
      .when(h.startsWith("/"), concat(root, h))
      .otherwise(concat(root, dir, h))
  }

  def extractText(htmlBody: Column): Column = {
    val noScript = regexp_replace(
      regexp_replace(htmlBody, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noScript, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) =>
        replace(c, lit(ent), lit(ch))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
