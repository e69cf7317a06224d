package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.sources.Warc

/** Pins for the splittable per-record-gzip crawl reader (the Common
  * Crawl `.warc.gz` layout): row parity with the text scan across
  * split sizes, anchor validation against payload magic collisions,
  * multi-record members, member chaining.
  */
class WarcGzSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val tmp = Files.createTempDirectory("graft-warcgz").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("warcgz-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private val crawlPath =
    s"${graft.fixtures.GenomicFixtures.rawDir}/crawl.warc"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|"))
      .sorted.toSeq

  test("readGz == read on the re-encoded crawl fixture, across split " +
    "sizes from absurdly small to whole-file") {
    val text = Files.readString(Paths.get(crawlPath))
    val p = s"$tmp/crawl.warc.gz"
    Files.write(Paths.get(p), Warc.gzipPerRecord(text))
    val want = rows(Warc.read(spark, crawlPath))
    Seq(128L, 500L, 4096L, 1L << 30).foreach { s =>
      assert(rows(Warc.readGz(spark, p, splitSize = s)) == want,
        s"splitSize=$s")
    }
  }

  test("member count equals record count (one member per record), " +
    "and members chain exactly after the anchor") {
    val text = Files.readString(Paths.get(crawlPath))
    val p = s"$tmp/chain.warc.gz"
    Files.write(Paths.get(p), Warc.gzipPerRecord(text))
    val nRecords = Warc.read(spark, crawlPath).count()
    assert(Warc.gzMembers(spark, p, 1L << 30).count() == nRecords)
    assert(Warc.gzMembers(spark, p, 256L).count() == nRecords)
  }

  test("a payload containing the raw gzip magic bytes cannot " +
    "mis-anchor a split (inflate-validation rejects it)") {
    // payload with 1f 8b 08 00 at a range-scan-visible position
    val evil = new String(Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x00,
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00), "ISO-8859-1")
    val body = "x" * 100 + evil + "y" * 100
    val rec = "WARC/1.0\r\nWARC-Type: resource\r\n" +
      s"WARC-Record-ID: <urn:uuid:evil>\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body\r\n\r\n"
    val recs = (0 until 20).map(i =>
      rec.replace("evil", s"evil$i")).mkString
    val p = s"$tmp/evil.warc.gz"
    // gzipPerRecord splits on the record separator; single blob here
    // is already in record grammar
    Files.write(Paths.get(p), Warc.gzipPerRecord(recs))
    // tiny splits force range anchors to scan right across the payload
    val got = Warc.readGz(spark, p, splitSize = 64L)
    assert(got.count() == 20)
    assert(got.where(org.apache.spark.sql.functions.col("truncated"))
      .count() == 0)
  }

  test("a member whose FNAME pushes the gzip header past 1 KiB still " +
    "anchors and inflates: the header probe window grows instead of " +
    "silently skipping the member") {
    def gzWithFname(payload: Array[Byte], fname: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array[Byte](0x1f, 0x8b.toByte, 0x08, 0x08, // FLG=FNAME
        0, 0, 0, 0, 0, 0xff.toByte))
      out.write(fname.getBytes("US-ASCII")); out.write(0)
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](payload.length + 64)
      var n = 0
      while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
      d.end()
      out.write(buf, 0, n)
      val crc = new java.util.zip.CRC32(); crc.update(payload)
      val le = java.nio.ByteBuffer.allocate(8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      le.putInt(crc.getValue.toInt); le.putInt(payload.length)
      out.write(le.array())
      out.toByteArray
    }
    val text = Files.readString(Paths.get(crawlPath))
    // two members split at a record boundary, EACH with a 3 KiB FNAME:
    // the first exercises the range-0 inflate, the second the mid-file
    // anchor scan (both crashed/skipped under a capped 1 KiB probe)
    val cut = text.indexOf("WARC/1.0", 1)
    assert(cut > 0, "fixture must hold >= 2 records")
    val longName = "n" * 3000
    val bytes = gzWithFname(text.substring(0, cut).getBytes("UTF-8"),
      longName) ++ gzWithFname(text.substring(cut).getBytes("UTF-8"),
      longName)
    val p = s"$tmp/fname.warc.gz"
    Files.write(Paths.get(p), bytes)
    val want = rows(Warc.read(spark, crawlPath))
    Seq(256L, 1L << 30).foreach { s =>
      assert(rows(Warc.readGz(spark, p, splitSize = s)) == want,
        s"splitSize=$s")
    }
  }

  test("a single member holding MANY records re-splits on the record " +
    "boundary (spec-legal non-CC layout)") {
    val text = Files.readString(Paths.get(crawlPath))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(text.getBytes("UTF-8"))
    gz.finish()
    val p = s"$tmp/mono.warc.gz"
    Files.write(Paths.get(p), bos.toByteArray)
    val want = rows(Warc.read(spark, crawlPath))
    assert(rows(Warc.readGz(spark, p, splitSize = 1L << 30)) == want)
  }
}
