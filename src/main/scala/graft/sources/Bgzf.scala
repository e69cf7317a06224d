package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** BGZF block-gzip writer (SAM spec §4.1) — the container htslib wraps
  * BAM/BCF/bgzipped-VCF/tabix data in: concatenated RFC-1952 gzip
  * members, each carrying the BC extra subfield (BSIZE = member length
  * − 1) and capped at 64 KiB, terminated by a fixed 28-byte empty
  * member. Because every member is a complete gzip stream, BGZF files
  * read through ANY spec-complete multi-member gzip inflater — the
  * JDK's GZIPInputStream ([[Bam.records]]) and Hadoop's gzip codec
  * (so `spark.read.text("x.vcf.gz")` just works; BamSpec pins a
  * 943-member file chaining correctly through both).
  */
private[graft] object Bgzf {

  /** The spec's fixed 28-byte empty-member EOF marker (§4.1.2). */
  val Eof: Array[Byte] = Array(
    0x1f, 0x8b, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xff, 0x06,
    0x00, 0x42, 0x43, 0x02, 0x00, 0x1b, 0x00, 0x03, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00).map(_.toByte)

  private def writeLe32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }

  /** Deflate `data[off, off+len)` as one BGZF member onto `out`. */
  def writeMember(out: ByteArrayOutputStream, data: Array[Byte],
                  off: Int, len: Int): Unit = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    deflater.setInput(data, off, len)
    deflater.finish()
    val cbuf = new Array[Byte](len + 64)
    var clen = 0
    while (!deflater.finished())
      clen += deflater.deflate(cbuf, clen, cbuf.length - clen)
    deflater.end()
    val crc = new CRC32()
    crc.update(data, off, len)
    val bsize = clen + 26 // header(18) + deflate + crc(4) + isize(4)
    require(bsize <= 0x10000, s"BGZF member overflow: $bsize")
    out.write(Array[Byte](0x1f.toByte, 0x8b.toByte, 0x08, 0x04,
      0, 0, 0, 0, 0, 0xff.toByte, // MTIME, XFL, OS=unknown
      0x06, 0x00, // XLEN = 6
      0x42, 0x43, 0x02, 0x00)) // BC subfield, SLEN=2
    out.write((bsize - 1) & 0xff); out.write(((bsize - 1) >> 8) & 0xff)
    out.write(cbuf, 0, clen)
    writeLe32(out, crc.getValue.toInt)
    writeLe32(out, len)
  }

  /** BGZF-compress `raw` in ≤ `blockSize` uncompressed chunks + EOF. */
  def compress(raw: Array[Byte], blockSize: Int = 0xff00): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    var off = 0
    while (off < raw.length) {
      val n = math.min(blockSize, raw.length - off)
      writeMember(out, raw, off, n)
      off += n
    }
    out.write(Eof)
    out.toByteArray
  }
}
