package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.fixtures.GenomicFixtures
import graft.operators.Multimodal

/** Hand-computed expectations for the REAL image kernels over the
  * committed PNGs in fixtures/png (pixel values documented where each
  * file is generated). Luminance is Rec.601 (0.299, 0.587, 0.114);
  * grayscale reads raw raster samples, so lum(gray g) = g/255 exactly.
  */
class MediaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("media-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GenomicFixtures.ensure(spark)
  }

  override def afterAll(): Unit = spark.stop()

  private def images = spark.read
    .parquet(s"${GenomicFixtures.dir}/images.parquet")

  test("decode reports the codec's real geometry and channel count") {
    val rows = Multimodal.decodeImage(images)
      .select("media_id", "width", "height", "channels")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(rows("gray_2x2") == ((2L, 2L, 1L)))
    assert(rows("rgb_3x2") == ((3L, 2L, 3L)))
    assert(rows("rgb_16x8") == ((16L, 8L, 3L)))
    assert(rows("rgba_4x4") == ((4L, 4L, 4L)))
    assert(rows("red_8x8") == ((8L, 8L, 3L)))
  }

  test("corrupt payload decodes to NULL, not an exception") {
    val s = spark
    import s.implicits._
    val bad = Seq(("junk", Array[Byte](1, 2, 3, 4, 5)))
      .toDF("media_id", "payload")
    val r = Multimodal.decodeImage(bad).select("width").collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }

  test("grid features are the hand-computed per-cell luminance means") {
    val feats = Multimodal.imageFeatures(images, 2, 2)
      .collect()
      .map(r => r.getAs[String]("media_id") ->
        r.getAs[scala.collection.Seq[Double]]("features")
          .map(v => math.rint(v * 1e6) / 1e6).toSeq)
      .toMap
    // gray_2x2 pixels [[0,85],[170,255]]; 1 pixel per cell, lum = g/255
    assert(feats("gray_2x2") == Seq(0.0, 0.333333, 0.666667, 1.0))
    // rgb_3x2: cells are col 0 | cols 1-2 per row.
    // row0 = red, (green+blue)/2; row1 = black, (gray128 + white)/2
    assert(feats("rgb_3x2") == Seq(0.299, 0.3505, 0.0, 0.75098))
    // red_8x8: constant red everywhere
    assert(feats("red_8x8") == Seq(0.299, 0.299, 0.299, 0.299))
    // rgba_4x4 checkerboard red/green: every 2x2 cell has 2 of each
    assert(feats("rgba_4x4") == Seq(0.443, 0.443, 0.443, 0.443))
  }

  test("resize pins the longer edge, floors the other, and resamples") {
    val rows = Multimodal.resizeImage(Multimodal.decodeImage(images),
      maxSide = 4)
      .select("media_id", "resized_w", "resized_h", "resized_mean")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(rows("rgb_16x8")._1 == 4L && rows("rgb_16x8")._2 == 2L)
    assert(rows("gray_2x2")._1 == 4L && rows("gray_2x2")._2 == 4L) // upscale
    assert(rows("rgb_3x2")._1 == 4L && rows("rgb_3x2")._2 == 2L)
    // bilinear resample of a constant image is constant: mean = lum(red)
    assert(rows("red_8x8") == ((4L, 4L, 0.299)))
    // means are real pixel statistics, so they stay in (0, 1) here
    assert(rows.values.forall(v => v._3 >= 0.0 && v._3 <= 1.0))
  }

  test("wav decode: hand-computed RMS/peak, chunk walk, NULL on poison") {
    val s = spark
    import s.implicits._
    // canonical header builder matching the fixture generator
    def wav(ch: Int, rate: Int, pre: Array[Byte],
            samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + pre.length + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + pre.length + dataLen)
        .put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(ch.toShort).putInt(rate)
        .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
        .put(pre)
        .put("data".getBytes).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // an extra LIST chunk between fmt and data: the fixed-offset layout
    // breaks, only a real chunk walk finds the data
    val listChunk = java.nio.ByteBuffer.allocate(12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes).putInt(4).put("INFO".getBytes).array()
    val samples = Array[Short](1000, -1000, 32767, -32768)
    val rows = Multimodal.decodeAudio(Seq(
      ("plain", wav(1, 8000, Array.emptyByteArray, samples)),
      ("chunked", wav(2, 44100, listChunk, samples)),
      ("poison", Array[Byte](1, 2, 3, 4)))
      .toDF("media_id", "payload"))
      .collect().map(r => r.getAs[String]("media_id") -> r).toMap
    val expectRms = BigDecimal(math.sqrt(
      samples.map(v => v.toDouble * v).sum / 4))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val p = rows("plain")
    assert(p.getAs[Long]("sample_rate") == 8000L &&
      p.getAs[Long]("channels") == 1L && p.getAs[Long]("n_frames") == 4L)
    assert(p.getAs[Double]("rms") == expectRms)
    assert(p.getAs[Long]("peak") == 32768L)
    val c = rows("chunked")
    assert(c.getAs[Long]("sample_rate") == 44100L &&
      c.getAs[Long]("channels") == 2L && c.getAs[Long]("n_frames") == 2L)
    assert(c.getAs[Double]("rms") == expectRms)
    assert(rows("poison").isNullAt(
      rows("poison").fieldIndex("sample_rate")))
  }

  test("mp4 box walk: version-aware mvhd, skipped boxes, largesize, " +
    "NULL on poison") {
    val s = spark
    import s.implicits._
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(typ.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    // 64-bit largesize form of the same box (size field = 1)
    def boxL(typ: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + body.length)
      bb.putInt(1).put(typ.getBytes("US-ASCII"))
        .putLong(16L + body.length).put(body)
      bb.array()
    }
    def ftyp(brand: String) = box("ftyp",
      brand.getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0))
    def mvhd0(ts: Int, dur: Int) = {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0).putInt(ts).putInt(dur)
      box("mvhd", b.array())
    }
    def mvhd1(ts: Int, dur: Long) = {
      val b = java.nio.ByteBuffer.allocate(112)
      b.putInt(0x01000000).putLong(0L).putLong(0L).putInt(ts).putLong(dur)
      box("mvhd", b.array())
    }
    val trak = box("trak", box("tkhd", new Array[Byte](84)))
    val v0 = ftyp("isom") ++ box("free", new Array[Byte](4)) ++
      box("moov", mvhd0(1000, 7500) ++ trak ++ trak) ++
      box("mdat", new Array[Byte](16))
    // v1 mvhd with a >u32 duration, mvhd not the first child, and the
    // moov box in 64-bit largesize form
    val bigDur = 5000000000L
    val v1 = ftyp("mp42") ++
      boxL("moov", trak ++ mvhd1(90000, bigDur) ++ trak ++ trak)
    val rows = Multimodal.decodeVideo(Seq(
      ("v0", v0), ("v1", v1),
      ("poison", Array.tabulate[Byte](24)(i => (i * 13 + 5).toByte)),
      // structurally valid boxes but no moov -> NULL
      ("nomoov", ftyp("isom") ++ box("mdat", new Array[Byte](8))))
      .toDF("media_id", "payload"))
      .collect().map(r => r.getAs[String]("media_id") -> r).toMap
    val a = rows("v0")
    assert(a.getAs[String]("major_brand") == "isom" &&
      a.getAs[Long]("timescale") == 1000L &&
      a.getAs[Long]("duration") == 7500L &&
      a.getAs[Long]("n_tracks") == 2L &&
      a.getAs[Double]("duration_sec") == 7.5)
    val b = rows("v1")
    assert(b.getAs[String]("major_brand") == "mp42" &&
      b.getAs[Long]("timescale") == 90000L &&
      b.getAs[Long]("duration") == bigDur &&
      b.getAs[Long]("n_tracks") == 3L)
    assert(rows("poison").isNullAt(rows("poison").fieldIndex("timescale")))
    assert(rows("nomoov").isNullAt(rows("nomoov").fieldIndex("timescale")))
  }

  test("jpeg marker walk: SOF fields, fill bytes, restart markers, " +
    "NULL on poison/SOS-first/truncation") {
    val s = spark
    import s.implicits._
    def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
      val len = body.length + 2
      Array(0xff.toByte, marker.toByte, (len >> 8).toByte, len.toByte) ++
        body
    }
    def sof(marker: Int, h: Int, w: Int, nc: Int): Array[Byte] =
      seg(marker, Array[Byte](8, (h >> 8).toByte, h.toByte,
        (w >> 8).toByte, w.toByte, nc.toByte) ++
        (1 to nc).flatMap(c => Seq(c.toByte, 0x11.toByte, 0.toByte)))
    val soi = Array(0xff.toByte, 0xd8.toByte)
    val app0 = seg(0xe0, "JFIF".getBytes("US-ASCII") ++ new Array[Byte](10))
    val dqt = seg(0xdb, new Array[Byte](65))
    // fill bytes (extra FFs) and a standalone TEM marker before SOF —
    // both legal marker-stream padding the walk must step over
    val baseline = soi ++ app0 ++ Array(0xff.toByte) ++
      Array(0xff.toByte, 0x01.toByte) ++ dqt ++ sof(0xc0, 1080, 1920, 3)
    val progressive = soi ++ dqt ++ sof(0xc2, 32, 16, 1)
    val sosFirst = soi ++ app0 ++ seg(0xda, Array[Byte](1, 1, 0, 0, 63, 0))
    val truncated = (soi ++ app0 ++ sof(0xc0, 64, 64, 3)).dropRight(9)
    val rows = Multimodal.decodeJpeg(Seq(
      ("base", baseline), ("prog", progressive), ("sos1", sosFirst),
      ("trunc", truncated),
      ("poison", Array.tabulate[Byte](16)(i => (i * 13 + 5).toByte)))
      .toDF("media_id", "payload"))
      .collect().map(r => r.getAs[String]("media_id") -> r).toMap
    val a = rows("base")
    assert(a.getAs[Long]("height") == 1080L &&
      a.getAs[Long]("width") == 1920L &&
      a.getAs[Long]("precision") == 8L &&
      a.getAs[Long]("n_components") == 3L &&
      !a.getAs[Boolean]("progressive") &&
      a.getAs[Double]("mpx") == 2.0736)
    val p = rows("prog")
    assert(p.getAs[Long]("height") == 32L &&
      p.getAs[Long]("width") == 16L && p.getAs[Boolean]("progressive"))
    Seq("sos1", "trunc", "poison").foreach { k =>
      assert(rows(k).isNullAt(rows(k).fieldIndex("height")), k)
    }
  }

  test("deflate_len: repetitive < prose < hex-noise ratios, " +
    "deterministic across evaluations, and the gate classes separate " +
    "at the keep threshold") {
    val s = spark
    import s.implicits._
    graft.plans.GraftFunctions.register(s)
    import org.apache.spark.sql.functions._
    val rep = "lorem ipsum dolor sit amet " * 40
    val prose = "the quick brown fox jumps over one lazy dog while " +
      "seventeen other animals watch from a distance and comment " +
      "on its form with varying degrees of enthusiasm " * 6
    val noise = (0 until 24).map(i => java.security.MessageDigest
      .getInstance("MD5").digest(s"n$i".getBytes)
      .map("%02x".format(_)).mkString).mkString
    val out = Seq(("rep", rep), ("prose", prose), ("noise", noise))
      .toDF("k", "t")
      .select(col("k"), length(col("t")).as("n"),
        call_function("graft_deflate_len", col("t")).as("d"))
      .collect().map(r => r.getString(0) ->
        (r.getInt(2).toDouble / r.getInt(1))).toMap
    assert(out("rep") < 0.1, s"repetitive must crush: ${out("rep")}")
    assert(out("rep") < out("prose") && out("prose") < out("noise"),
      out.toString)
    assert(out("noise") > 0.4, s"hex noise barely compresses: " +
      out("noise"))
    // determinism: two independent evaluations agree byte-for-byte
    val twice = Seq(prose, prose).toDF("t")
      .select(call_function("graft_deflate_len", col("t")).as("d"))
      .collect().map(_.getInt(0)).distinct
    assert(twice.length == 1)
    // the gate's three synthetic classes separate at the 0.1 keep
    // threshold (measured ratios ~0.04 / ~0.20 / ~0.56): only the
    // repetitive class drops
    val gate = graft.SparkEntry.queries("t38_compress_ratio")(s, "")
      .collect()
    assert(gate.length == 42)
    val byClass = gate.groupBy(r => r.getLong(0) % 3)
      .view.mapValues(_.map(_.getBoolean(4)).toSet).toMap
    assert(byClass(0L) == Set(false) && byClass(1L) == Set(true) &&
      byClass(2L) == Set(true), byClass.toString)
  }

  test("id3 walk: v3/v4 size grammars, trailing-NUL strip, UTF-16 " +
    "counts but nulls the field, hostile/truncated/no-tag null STRUCT") {
    val s = spark
    import s.implicits._
    def ss(v: Int) = Array(((v >> 21) & 0x7f).toByte,
      ((v >> 14) & 0x7f).toByte, ((v >> 7) & 0x7f).toByte,
      (v & 0x7f).toByte)
    def u32(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    def frame(id: String, body: Array[Byte], v4: Boolean) =
      id.getBytes("US-ASCII") ++
        (if (v4) ss(body.length) else u32(body.length)) ++
        Array[Byte](0, 0) ++ body
    def tag(major: Int, frames: Array[Byte], padding: Int) =
      "ID3".getBytes("US-ASCII") ++
        Array(major.toByte, 0.toByte, 0.toByte) ++
        ss(frames.length + padding) ++ frames ++
        Array.fill[Byte](padding)(0)
    // v3: latin1 TIT2 with a trailing NUL (must strip), UTF-16 TPE1
    // (enc 1: frame counts, field stays null), latin1 TALB with a
    // byte >= 0x80 (ö = 0xF6: ISO-8859-1 decode, not UTF-8
    // passthrough), binary PRIV
    val v3 = tag(3,
      frame("TIT2", 0.toByte +: ("Abc".getBytes("US-ASCII") :+ 0.toByte),
        v4 = false) ++
        frame("TPE1", 1.toByte +: Array[Byte](-1, -2, 0x41, 0),
          v4 = false) ++
        frame("TALB",
          0.toByte +: "Motör".getBytes("ISO-8859-1"), v4 = false) ++
        frame("PRIV", Array[Byte](7, 7), v4 = false), padding = 4)
    // v4: syncsafe frame size that would differ under u32 reading
    // (size 130 = 0x82 -> syncsafe bytes 0x01 0x02)
    val text130 = Array.fill[Byte](129)('x'.toByte)
    val v4t = tag(4, frame("TALB", 3.toByte +: text130, v4 = true), 0)
    // truncated: header promises more tag than the payload holds
    val trunc = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++
      ss(100) ++ Array.fill[Byte](20)(0)
    // hostile: first frame's size reaches past the tag end
    val hostile = tag(3, frame("TIT2",
      0.toByte +: "hi".getBytes("US-ASCII"), v4 = false), 0)
      .updated(17, 0x70.toByte) // blow up the frame-size byte
    // header flags: unsync (0x80) / ext header (0x40) shift the frame
    // grammar — the struct must null, never parse shifted data
    val flagged = tag(3, frame("TIT2",
      0.toByte +: "hi".getBytes("US-ASCII"), v4 = false), 0)
      .updated(5, 0x40.toByte)
    val rows = Multimodal.decodeId3(Seq(
      ("v3", v3), ("v4", v4t), ("trunc", trunc), ("hostile", hostile),
      ("flagged", flagged),
      ("notag", Array[Byte](-1, -5, 1, 2, 3, 4)))
      .toDF("media_id", "payload"))
      .collect().map(r => r.getAs[String]("media_id") -> r).toMap
    val a = rows("v3")
    assert(a.getAs[Long]("version") == 3L)
    assert(a.getAs[Long]("n_frames") == 4L)
    assert(a.getAs[String]("title") == "Abc")       // NUL stripped
    assert(a.isNullAt(a.fieldIndex("artist")))      // UTF-16 -> null
    assert(a.getAs[String]("album") == "Motör")     // latin1 decoded
    val b = rows("v4")
    assert(b.getAs[Long]("version") == 4L &&
      b.getAs[Long]("n_frames") == 1L &&
      b.getAs[String]("album") == "x" * 129)
    Seq("trunc", "hostile", "flagged", "notag").foreach { k =>
      assert(rows(k).isNullAt(rows(k).fieldIndex("version")), k)
    }
  }

  test("exif walk: both byte orders, inline SHORT, offset ASCII, " +
    "missing tags null FIELDS, hostile offset/no-exif null STRUCT") {
    val s = spark
    import s.implicits._
    def seg(marker: Int, body: Array[Byte]): Array[Byte] = {
      val len = body.length + 2
      Array(0xff.toByte, marker.toByte, (len >> 8).toByte, len.toByte) ++
        body
    }
    def app1(t: Array[Byte]) =
      seg(0xe1, "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ t)
    val soi = Array(0xff.toByte, 0xd8.toByte)
    def u16le(v: Int) = Array((v & 0xff).toByte, (v >> 8).toByte)
    def u32le(v: Int) = Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff,
      (v >> 24) & 0xff).map(_.toByte)
    // LE TIFF, single Orientation entry (inline SHORT value)
    val oriOnly = Array[Byte](0x49, 0x49) ++ u16le(42) ++ u32le(8) ++
      u16le(1) ++ u16le(0x0112) ++ u16le(3) ++ u32le(1) ++
      u16le(8) ++ Array[Byte](0, 0) ++ u32le(0)
    // BE TIFF with Make at an offset PAST the segment end (hostile)
    def u16be(v: Int) = Array((v >> 8).toByte, (v & 0xff).toByte)
    def u32be(v: Int) = Array((v >> 24) & 0xff, (v >> 16) & 0xff,
      (v >> 8) & 0xff, v & 0xff).map(_.toByte)
    val hostile = Array[Byte](0x4d, 0x4d) ++ u16be(42) ++ u32be(8) ++
      u16be(1) ++ u16be(0x010f) ++ u16be(2) ++ u32be(9) ++
      u32be(50000) ++ u32be(0)
    val rows = Multimodal.decodeExif(Seq(
      ("ori", soi ++ app1(oriOnly) ++ Array(0xff.toByte, 0xd9.toByte)),
      ("hostile", soi ++ app1(hostile)),
      ("noexif", soi ++ Array(0xff.toByte, 0xd9.toByte)),
      ("poison", Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)))
      .toDF("media_id", "payload"))
      .collect().map(r => r.getAs[String]("media_id") -> r).toMap
    val o = rows("ori")
    assert(o.getAs[String]("byte_order") == "II" &&
      o.getAs[Long]("orientation") == 8L &&
      o.isNullAt(o.fieldIndex("make")), o.toString)
    val h = rows("hostile")
    assert(h.getAs[String]("byte_order") == "MM" &&
      h.isNullAt(h.fieldIndex("make")),
      "a value offset past the segment must null the FIELD, not read " +
        "astray")
    Seq("noexif", "poison").foreach { k =>
      assert(rows(k).isNullAt(rows(k).fieldIndex("byte_order")), k)
    }
    // the committed fixture table end-to-end (what m11 gates on)
    graft.fixtures.GenomicFixtures.ensure(s)
    val fx = Multimodal.decodeExif(
      s.read.parquet(s"${graft.fixtures.GenomicFixtures.dir}/exif.parquet"))
      .collect().map(r => r.getAs[String]("media_id") -> r).toMap
    val ii = fx("exif_ii")
    assert(ii.getAs[String]("byte_order") == "II" &&
      ii.getAs[Long]("orientation") == 6L &&
      ii.getAs[String]("make") == "graftCam" &&
      ii.getAs[String]("datetime") == "2026:08:15 09:30:00")
    val mm = fx("exif_mm")
    assert(mm.getAs[String]("byte_order") == "MM" &&
      mm.getAs[Long]("orientation") == 1L &&
      mm.getAs[String]("make") == "Acme Optical" &&
      mm.getAs[String]("datetime") == "2025:12:01 23:59:58")
    Seq("exif_plain", "exif_trunc").foreach { k =>
      assert(fx(k).isNullAt(fx(k).fieldIndex("byte_order")), k)
    }
  }

  test("vadSegments: loud-quiet-loud splits into two segments, " +
    "sub-threshold media emit nothing, poison emits nothing") {
    val s = spark
    import s.implicits._
    def wav(samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
      bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      bb.put("data".getBytes).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // frames of 8 samples: frames 0-1 loud, 2-3 quiet, 4 loud again
    val samples = Array.tabulate(40) { i =>
      val f = i / 8
      (if (f <= 1 || f == 4) 2000 + (i % 5) else 10).toShort
    }
    val media = Seq(
      ("lql", wav(samples)),
      ("quiet", wav(Array.fill(16)(5.toShort))),
      ("poison", Array[Byte](9, 9, 9)))
      .toDF("media_id", "payload")
    val segs = Multimodal.vadSegments(media, rmsThreshold = 500.0)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(segs == Set(("lql", 0L, 1L, 2L), ("lql", 4L, 4L, 1L)),
      s"got $segs")
  }

  test("perceptual dHash: scale-invariant, small radius for a local " +
    "edit, unrelated image excluded, poison null, no duplicate pairs") {
    val s = spark
    import s.implicits._
    val imgs = spark.read
      .parquet(s"${GenomicFixtures.dir}/images_phash.parquet")
    val hashes = Multimodal.dHash(imgs).select("media_id", "phash")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // the same gradient FIELD at 2x resolution: identical grid means,
    // identical hash — resolution is hashed away by construction
    assert(hashes("grad_16x16") == hashes("grad_32x32"))
    // a 2x4-pixel dark patch inverts a few local gradients: small
    // positive Hamming distance, inside the pairing radius
    val d = ham(hashes("grad_16x16"), hashes("grad_tweak_16x16"))
    assert(d > 0 && d <= 6, s"tweak hamming $d")
    // the unrelated high-frequency pattern stays outside the radius
    Seq("grad_16x16", "grad_32x32", "grad_tweak_16x16").foreach { g =>
      assert(ham(hashes(g), hashes("noise_16x16")) > 6,
        s"$g too close to noise")
    }
    // pair join: exactly the three near pairs, each claimed once
    // (first-shared-band ownership — no dedup pass to hide doubles in)
    val pairs = Multimodal.phashPairs(imgs, "media_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(pairs.length == pairs.distinct.length, "duplicate pairs")
    assert(pairs.map(p => (p._1, p._2)).toSet == Set(
      ("grad_16x16", "grad_32x32"),
      ("grad_16x16", "grad_tweak_16x16"),
      ("grad_32x32", "grad_tweak_16x16")), pairs.toSeq)
    assert(pairs.forall(p => p._3 >= 0 && p._3 <= 6))
    // poison blob: null hash, silently out of the pair universe
    val bad = Seq(("junk", Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    assert(Multimodal.dHash(bad).select("phash").head.isNullAt(0))
  }

  test("wav frames: hand-computed RMS/ZCR per frame, channel averaging, " +
    "tail frame, poison -> nothing") {
    val s = spark
    import s.implicits._
    def wav(ch: Int, rate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(ch.toShort).putInt(rate)
        .putInt(rate * ch * 2).putShort((ch * 2).toShort).putShort(16)
        .put("data".getBytes).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    // mono, 5 samples at frameSamples=4: frame 0 = (100,-100,100,-100)
    // -> rms 100, zcr 1.0; frame 1 = (50) tail -> rms 50, zcr 0.0
    val mono = Array[Short](100, -100, 100, -100, 50)
    // stereo frames average channels: L=(200,-200), R=(0,0) -> mono
    // (100,-100): rms 100, zcr 1.0
    val stereo = Array[Short](200, 0, -200, 0)
    val out = Multimodal.audioFrames(Seq(
      ("mono", wav(1, 8000, mono)),
      ("stereo", wav(2, 8000, stereo)),
      ("poison", Array[Byte](9, 9, 9)))
      .toDF("media_id", "payload"), frameSamples = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(("mono", 0L)) == ((4L, 100.0, 1.0)))
    assert(out(("mono", 1L)) == ((1L, 50.0, 0.0)))
    assert(out(("stereo", 0L)) == ((2L, 100.0, 1.0)))
    assert(!out.keySet.exists(_._1 == "poison"),
      "poison blob must contribute no frames")
  }

  test("audio dedup: gain-scaled copy pairs at cosine 1, unrelated and " +
    "short/poison payloads stay out") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def wav(ch: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(ch.toShort).putInt(8000)
        .putInt(8000 * ch * 2).putShort((ch * 2).toShort).putShort(16)
        .put("data".getBytes).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }
    val base = Array.tabulate(32)(i => (((i * 733 + 11) % 1601) - 800).toShort)
    val media = Seq(
      ("orig", wav(1, base)),
      ("loud", wav(1, base.map(v => (v * 3).toShort))),
      // a DIFFERENT energy envelope (loud first half, near-silent
      // second): two flat-envelope noises would be near-parallel in
      // frame-energy space — the fingerprint discriminates envelopes,
      // not waveforms
      ("other", wav(1, Array.tabulate(32)(i =>
        (if (i < 16) ((i * 397 + 5) % 1201) - 600
         else ((i * 397 + 5) % 41) - 20).toShort))),
      ("short", wav(1, base.take(8))), // 1 frame < nFrames -> dropped
      ("poison", Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val vecs = Multimodal.audioVectors(media, frameSamples = 8,
      nFrames = 4)
    assert(vecs.collect().map(_.getString(0)).toSet ==
      Set("orig", "loud", "other"))
    val pairs = graft.operators.Similarity.rangeCosine(
      vecs.select(col("media_id").as("id"), col("vec").as("qvec")),
      vecs.select(col("media_id").as("neighbor"), col("vec").as("cvec")),
      threshold = 0.999, qId = "id", cId = "neighbor")
      .where(col("id") < col("neighbor")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq(("loud", "orig", 1.0)), pairs.toSeq)
  }
}
