package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.sources.{Fasta, Gtf, Vcf}

/** Source edge cases: CRLF input, haploid genotype padding, FASTA writer
  * round-trip, header grammar corners.
  */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val tmp = Files.createTempDirectory("graft-sources").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("sources-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def write(name: String, content: String): String = {
    val p = Paths.get(tmp, name)
    Files.writeString(p, content)
    p.toString
  }

  test("CRLF VCF parses without stray carriage returns") {
    val p = write("crlf.vcf",
      "##x\r\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\r\n" +
        "1\t10\trs1\tA\tG\t.\tPASS\tAF=0.5\tGT\t0|1\r\n")
    val row = Vcf.read(spark, p).collect()(0)
    assert(row.getAs[scala.collection.Seq[String]]("genotypes").toSeq == Seq("0|1")) // no \r
    assert(Vcf.sampleNames(spark, p) == Seq("S1"))
  }

  test("CRLF FASTA keeps sequences clean") {
    val p = write("crlf.fasta", ">sp|P1|desc\r\nMASR\r\nLLK\r\n")
    val row = Fasta.read(spark, p).collect()(0)
    assert(row.getAs[String]("sequence") == "MASRLLK")
    assert(row.getAs[String]("tag") == "generic_sp")
  }

  test("CRLF GTF last field has no trailing carriage return") {
    val p = write("crlf.gtf",
      "1\tt\texon\t1\t10\t.\t+\t.\tgene_id \"G\";\r\n")
    val row = Gtf.read(spark, p).collect()(0)
    assert(row.getAs[String]("attributes") == "gene_id \"G\";")
  }

  test("haploid genotypes pad to x|0 and re-index per allele") {
    val p = write("haploid.vcf",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n" +
        "X\t5\trs\tA\tG,T\t.\t.\tAF=0.3,0.1\tGT\t2\t1|2\n")
    val rows = Vcf.normalize(Vcf.read(spark, p), 0.0)
      .orderBy("alt").collect()
    // allele G (idx 1): S1 "2" -> "0|0"; S2 "1|2" -> "1|0"
    val g = rows.find(_.getAs[String]("alt") == "G").get
    assert(g.getAs[scala.collection.Seq[String]]("genotypes").toSeq == Seq("0|0", "1|0"))
    assert(g.getAs[Double]("allele_af") == 0.3)
    // allele T (idx 2): S1 "2" -> "1|0"; S2 "1|2" -> "0|1"
    val t = rows.find(_.getAs[String]("alt") == "T").get
    assert(t.getAs[scala.collection.Seq[String]]("genotypes").toSeq == Seq("1|0", "0|1"))
    assert(t.getAs[Double]("allele_af") == 0.1)
  }

  test("MAF INFO field is picked up when AF is absent (af-field fallback)") {
    val p = write("maf.vcf",
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n" +
        "1\t10\trs1\tA\tG\t.\t.\tAC=3;MAF=0.25\tGT\t0|1\n" +     // MAF only
        "1\t20\trs2\tC\tT\t.\t.\tAF=0.4;MAF=0.9\tGT\t1|0\n" +    // AF wins
        "1\t30\trs3\tG\tA\t.\t.\tAC=1\tGT\t0|0\n")               // neither
    val rows = Vcf.read(spark, p).orderBy("pos").collect()
    assert(rows(0).getAs[String]("af") == "0.25")
    assert(rows(1).getAs[String]("af") == "0.4")
    assert(rows(2).getAs[String]("af") == null)
    // custom field name, no fallback — vcf_filter_fix.py --af_field
    val custom = Vcf.read(spark, p, afFields = Seq("AC"))
      .orderBy("pos").collect()
    assert(custom.map(_.getAs[String]("af")).toSeq == Seq("3", null, "1"))
    // the AF filter in normalize honors the fallback value
    val norm = Vcf.normalize(Vcf.read(spark, p), minAf = 0.3).collect()
    assert(norm.map(_.getAs[String]("id")).toSeq == Seq("rs2"))
  }

  test("FASTA writer round-trips through the reader") {
    val ss = spark
    import ss.implicits._
    val df = Seq(("generic_sp", "A1", "d one", "MASRL"),
      ("generic_cont", "C1", "", "MKRLL"))
      .toDF("tag", "accession", "description", "sequence")
    val out = s"$tmp/out.fasta"
    Fasta.write(df, out)
    val back = Fasta.read(spark, out).orderBy("accession").collect()
    assert(back.length == 2)
    assert(back(0).getAs[String]("sequence") == "MASRL")
    assert(back(0).getAs[String]("tag") == "generic_sp")
  }

  test("BED parses, converts 0-based half-open to 1-based inclusive, " +
    "and feeds the interval join") {
    val s2 = spark
    import s2.implicits._
    val raw = Seq(
      "track name=\"t\" description=\"d\"",
      "# comment",
      "chr1\t99\t200\tgene_A\t960\t+",
      "chr1\t500\t500\tins_site",        // zero-length, no score/strand
      "chr2\t0\t10").toDF("value")       // minimal 3-column row
    val bed = graft.sources.Bed.parseLines(raw, "value")
      .orderBy("chrom", "start").collect()
    assert(bed.length == 3)
    assert(bed(0).getString(0) == "chr1" && bed(0).getLong(1) == 99 &&
      bed(0).getLong(2) == 200 && bed(0).getString(3) == "gene_A" &&
      bed(0).getLong(4) == 960 && bed(0).getString(5) == "+")
    assert(bed(1).getString(3) == "ins_site" && bed(1).isNullAt(4) &&
      bed(1).isNullAt(5))
    assert(bed(2).isNullAt(3))
    val iv = graft.sources.Bed.toIntervals(
      graft.sources.Bed.parseLines(raw, "value"))
      .orderBy("chrom", "start").collect()
    // [99,200) 0-based -> [100,200] 1-based; zero-length 500 -> [501,501]
    assert(iv(0).getLong(1) == 100 && iv(0).getLong(2) == 200)
    assert(iv(1).getLong(1) == 501 && iv(1).getLong(2) == 501)
    assert(iv(2).getLong(1) == 1 && iv(2).getLong(2) == 10)
    // integration: 1-based point 100 (first covered base) joins gene_A;
    // 0-based naive coordinates would have matched pos 99 instead
    val pts = Seq(("chr1", 99L, "before"), ("chr1", 100L, "first"),
      ("chr1", 200L, "last"), ("chr1", 201L, "after"))
      .toDF("chrom", "pos", "pid")
    val hits = graft.operators.IntervalJoin.pointsInIntervals(
      pts, graft.sources.Bed.toIntervals(
        graft.sources.Bed.parseLines(raw, "value")),
      Seq("chrom"), binSize = 50)
      .select("pid").collect().map(_.getString(0)).toSet
    assert(hits == Set("first", "last"))
    // writer round trip: null optional fields surface as "." and come
    // back null; coordinates convert symmetrically
    val out = s"${sys.props("java.io.tmpdir")}/graft-test-bed-" +
      ProcessHandle.current.pid
    val ivIn = graft.sources.Bed.toIntervals(
      graft.sources.Bed.parseLines(raw, "value"))
    graft.sources.Bed.writeIntervals(ivIn, out)
    val rawBack = spark.read.text(out).collect().map(_.getString(0))
    assert(rawBack.exists(_.endsWith("\t.\t.")), rawBack.mkString(";"))
    val back = graft.sources.Bed.toIntervals(
      graft.sources.Bed.read(spark, out))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(rows(back) == rows(ivIn))
  }

  test("GFF3 parses Parent hierarchy and percent-decodes attributes") {
    import org.apache.spark.sql.functions._
    val g = graft.sources.Gff3.read(spark, "fixtures/annotations.gff3")
    // directives dropped, 10 feature rows
    assert(g.count() == 10)
    // percent decoding: ; = % restored, %25 decoded last
    val note = g.where(graft.sources.Gff3.attr(col("attributes"), "ID")
        === "gene2")
      .select(graft.sources.Gff3.attr(col("attributes"), "Note"))
      .head.getString(0)
    assert(note == "semi;colon and eq= and pct%", note)
    // absent attribute is null, not empty string
    assert(g.where(col("feature") === "gene")
      .select(graft.sources.Gff3.attr(col("attributes"), "Parent"))
      .collect().forall(_.isNullAt(0)))
    // hierarchy: exons group under their mRNA Parent, sorted by start
    val ex = graft.sources.Gff3.exonsByParent(g)
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1)
          .map(e => (e.getLong(0), e.getLong(1)))).toMap
    assert(ex.keySet == Set("tx1", "tx2", "tx3"))
    assert(ex("tx1") == Seq((100L, 200L), (300L, 500L)))
    assert(ex("tx3") == Seq((1000L, 1500L), (1600L, 2000L)))
  }

  test("WARC parses records, trims trailing junk to Content-Length, " +
    "flags truncated captures, and survives forced multi-split reads") {
    import graft.sources.Warc
    val path = s"${graft.fixtures.GenomicFixtures.rawDir}/crawl.warc"
    val rows = Warc.read(spark, path).collect()
      .map(r => (r.getString(0), Option(r.getString(3)),
        r.getLong(5), r.getString(6), r.getBoolean(7))).sortBy(_._2)
    assert(rows.length == 8)
    assert(rows.map(_._1).count(_ == "response") == 5)
    // trailing junk past Content-Length never reaches the payload
    val junk = rows.find(_._2.contains("http://example.com/junk")).get
    assert(junk._3 == junk._4.length && !junk._4.contains("IGNORED"))
    // truncated capture: declared 1000, stored less, flag set
    val cut = rows.find(_._2.contains("http://example.com/cut")).get
    assert(cut._3 == 1000L && cut._4.length < 1000 && cut._5)
    assert(rows.count(_._5) == 1)
    // splittability: force tiny file splits — the boundary scan must
    // reassemble the same 8 records from many partial-file tasks
    val wholePayloadChars = Warc.read(spark, path)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(col("payload"))))
      .head.getLong(0)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "512")
    try {
      val again = Warc.read(spark, path)
      assert(again.rdd.getNumPartitions > 1,
        s"split not forced: ${again.rdd.getNumPartitions}")
      assert(again.count() == 8)
      assert(again.agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.length(col("payload"))))
        .head.getLong(0) == wholePayloadChars)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("SAM: CIGAR ref spans count M/D/N/=/X only, flags decode, " +
    "unmapped reads null out") {
    import org.apache.spark.sql.functions.col
    val rows = graft.sources.Sam
      .read(spark, s"${graft.fixtures.GenomicFixtures.rawDir}/aligned.sam")
      .collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 9)
    def refEnd(q: String): Option[Long] = {
      val r = rows(q)
      if (r.isNullAt(r.fieldIndex("ref_end"))) None
      else Some(r.getLong(r.fieldIndex("ref_end")))
    }
    assert(refEnd("r1").contains(40L))   // 11 + 30M - 1
    assert(refEnd("r2").contains(85L))   // 61 + 10M+5D+10M - 1
    assert(refEnd("r3").contains(122L))  // 105 + 10M+8M - 1 (S/I ignored)
    assert(refEnd("r4").contains(175L))  // 141 + 8M+20N+7M - 1
    assert(refEnd("r8").isEmpty)         // unmapped
    assert(refEnd("r9").contains(44L))   // 25 + 20M - 1 (overlaps r1)
    val r5f = rows("r5")
    assert(r5f.getBoolean(r5f.fieldIndex("is_paired")) &&
      r5f.getBoolean(r5f.fieldIndex("is_proper_pair")) &&
      r5f.getBoolean(r5f.fieldIndex("is_first")))
    val r6f = rows("r6")
    assert(r6f.getBoolean(r6f.fieldIndex("is_secondary")) &&
      r6f.getBoolean(r6f.fieldIndex("is_reverse")) &&
      r6f.isNullAt(r6f.fieldIndex("seq")))
    assert(rows("r7").getBoolean(rows("r7").fieldIndex("is_dup")))
    val r8f = rows("r8")
    assert(r8f.getBoolean(r8f.fieldIndex("is_unmapped")) &&
      r8f.isNullAt(r8f.fieldIndex("rname")) &&
      r8f.isNullAt(r8f.fieldIndex("pos")))
    // interval-operator integration: mapped reads feed pointsInIntervals
    // shape directly (1-based inclusive [pos, ref_end])
    val mapped = graft.sources.Sam
      .read(spark, s"${graft.fixtures.GenomicFixtures.rawDir}/aligned.sam")
      .where(col("pos").isNotNull)
      .select(col("rname").as("chrom"), col("pos").as("start"),
        col("ref_end").as("end"))
    assert(graft.operators.Coverage.coverage(mapped).count() > 0)
  }

  test("markDuplicates: unclipped-5' keys (soft clips, reverse ends), " +
    "pair signatures, quality winner, secondary inherits, unmapped " +
    "unmarked") {
    val out = graft.operators.MarkDup.markDuplicates(
      graft.sources.Sam.read(spark,
        s"${graft.fixtures.GenomicFixtures.rawDir}/dupreads.sam"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        r.getBoolean(r.fieldIndex("dup"))).toMap
    assert(out.size == 15)
    // forward group at unclipped 25: s1 (qual 800) kept; s2 (400) and
    // the soft-clip-shifted s3 (pos 27, 2S18M -> 25; 640) duplicates
    assert(!out(("s1", 0)) && out(("s2", 0)) && out(("s3", 0)))
    // s2's secondary alignment inherits the duplicate verdict
    assert(out(("s2", 256)))
    // reverse group keyed on unclipped END 59: s4 kept; s5 (leading
    // clip is read-3' on reverse: end unmoved) and s6 (trailing clip
    // extends 57 -> 59) duplicates
    assert(!out(("s4", 16)) && out(("s5", 16)) && out(("s6", 16)))
    // pair group: p2 duplicates p1 on BOTH ends (both mates marked);
    // p3 shares only the forward end -> distinct signature, kept
    assert(!out(("p1", 99)) && !out(("p1", 147)))
    assert(out(("p2", 99)) && out(("p2", 147)))
    assert(!out(("p3", 99)) && !out(("p3", 147)))
    // unique single and unmapped read pass through unmarked
    assert(!out(("u1", 0)) && !out(("um1", 4)))
  }

  test("idxstats: per-@SQ counts incl. zero-read refs, mate-placed " +
    "unmapped counted per reference, '*' row for placeless") {
    val sam = Seq(
      "@SQ\tSN:c1\tLN:100",
      "@SQ\tSN:c2\tLN:50",          // no reads -> zeros
      "r1\t0\tc1\t10\t60\t5M\t*\t0\t0\tAAAAA\tIIIII",
      "r2\t256\tc1\t10\t0\t5M\t*\t0\t0\t*\t*",   // secondary COUNTS
      // mate-placed unmapped: flag 4 but RNAME bound to c1
      "r3\t4\tc1\t10\t0\t*\t*\t0\t0\tAAAA\tIIII",
      "r4\t4\t*\t0\t0\t*\t*\t0\t0\tAAAA\tIIII")   // placeless
      .mkString("\n")
    val dir = java.nio.file.Files.createTempDirectory("graft-idx")
    val p = dir.resolve("t.sam")
    java.nio.file.Files.writeString(p, sam + "\n")
    val out = graft.sources.Sam.idxstats(spark, p.toString).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      "c1" -> ((100L, 2L, 1L)),
      "c2" -> ((50L, 0L, 0L)),
      "*" -> ((0L, 0L, 1L))))
  }

  test("Sitemap.parse: block order, loc trim + entity decode, optional " +
    "fields null, malformed priority/lastmod null not throw") {
    val s = spark
    import s.implicits._
    val body = """<urlset>
      |<url><loc> http://a/?x=1&amp;y=&lt;2&gt; </loc>
      |<lastmod>2024-02-29</lastmod><priority>0.5</priority></url>
      |<url><loc>http://b/</loc><lastmod>yesterday</lastmod>
      |<priority>high</priority></url>
      |<url><changefreq>daily</changefreq></url>
      |</urlset>""".stripMargin
    val out = graft.sources.Sitemap
      .parse(Seq(("sm", body)).toDF("uri", "body"))
      .collect()
    // the loc-less block drops; order preserved
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L))
    assert(out(0).getString(2) == "http://a/?x=1&y=<2>")
    assert(out(0).getDate(3).toString == "2024-02-29" &&
      out(0).getDouble(5) == 0.5)
    // malformed lastmod/priority null instead of ANSI-throwing
    assert(out(1).isNullAt(3) && out(1).isNullAt(5))
  }

  test("chain file: block walk accumulates t/q offsets, bare last line, " +
    "minus-strand header carried through") {
    val b = graft.sources.Chain
      .read(spark, s"${graft.fixtures.GenomicFixtures.rawDir}/lift.chain")
      .collect()
      .map(r => (r.getString(0), r.getLong(7), r.getLong(8),
        r.getLong(9), r.getLong(10), r.getString(6)))
      .sortBy(t => (t._1, t._2))
    // chain 1: tStart 10 qStart 20; blocks 30/10/15, 20/5/10, 35
    assert(b.filter(_._1 == "1").toSeq == Seq(
      ("1", 10L, 20L, 30L, 40L, "+"),
      ("1", 50L, 65L, 20L, 70L, "+"),
      ("1", 75L, 95L, 35L, 110L, "+")), b.toSeq)
    // chain 2: single bare block line, '-' strand preserved
    assert(b.filter(_._1 == "2").toSeq ==
      Seq(("2", 20L, 10L, 40L, 60L, "-")))
    assert(b.length == 5)
  }

  test("WARC httpBody/extractText: entity order, script/style removal, " +
    "no-header payloads") {
    import graft.sources.Warc
    val s = spark
    import s.implicits._
    val cases = Seq(
      // &amp;lt; must decode to &lt; (one level), not <
      ("a", "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        "<p>x &amp;lt; y</p>"),
      ("b", "HTTP/1.1 200 OK\r\n\r\n<style>p{}</style><script>if(1<2)" +
        "document.write('<b>hi</b>')</script><i>kept</i>"),
      ("c", "no header split here"))
      .toDF("id", "payload")
      .select(col("id"),
        Warc.httpStatus(col("payload")).as("st"),
        Warc.extractText(Warc.httpBody(col("payload"))).as("txt"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), r.getString(2))).toMap
    assert(cases("a") == (Some(200), "x &lt; y"))
    assert(cases("b") == (Some(200), "kept"))
    assert(cases("c") == (None, ""))
  }

  test("WARC extractLinks: quote styles, fragment drop, href-less " +
    "anchors, attribute-rich tags") {
    val s = spark
    import s.implicits._
    import graft.sources.Warc
    val html =
      """<html><body>
        |<a href="http://a.com/x">dq</a>
        |<a href='/rel'>sq</a>
        |<a href=bare>uq</a>
        |<A CLASS="nav" HREF="https://b.org/y?q=1">caps attrs</A>
        |<a href="#frag">same-page</a>
        |<a name='x'>no href</a>
        |<a href="">empty</a>
        |</body></html>""".stripMargin
    val out = Seq(html).toDF("h")
      .select(org.apache.spark.sql.functions.col("h"),
        Warc.extractLinks(org.apache.spark.sql.functions.col("h"))
          .as("links"))
      .collect().head.getSeq[String](1)
    assert(out == Seq("http://a.com/x", "/rel", "bare",
      "https://b.org/y?q=1"))
  }

  test("Robots: stanza grouping, longest-match with Allow tie-win, " +
    "agent-specific precedence, unknown host allowed") {
    val s = spark
    import s.implicits._
    import graft.sources.Robots
    val body =
      """User-agent: *
        |Disallow: /a/   # trailing comment
        |Allow: /a/b
        |
        |User-agent: evilbot
        |Disallow: /
        |Disallow:
        |""".stripMargin
    val rules = Robots.rules(
      Seq(("http://ex.com/robots.txt", body)).toDF("uri", "body"))
    val r = rules.collect()
      .map(x => (x.getString(1), x.getString(2), x.getString(3))).toSet
    assert(r == Set(("*", "disallow", "/a/"), ("*", "allow", "/a/b"),
      ("evilbot", "disallow", "/")),
      s"empty-path and comment lines must drop: $r")
    val urls = Seq("http://ex.com/a/x", "http://ex.com/a/bc",
      "http://ex.com/c", "http://other.org/a/x").toDF("url")
    def results(agent: String) =
      Robots.check(urls, rules, agent).collect()
        .map(x => x.getString(0) -> x.getBoolean(1)).toMap
    val star = results("anybot")
    assert(!star("http://ex.com/a/x"), "prefix disallow")
    assert(star("http://ex.com/a/bc"),
      "longer Allow must beat the shorter Disallow")
    assert(star("http://ex.com/c") && star("http://other.org/a/x"))
    val evil = results("evilbot")
    assert(!evil("http://ex.com/a/x") && !evil("http://ex.com/a/bc") &&
      !evil("http://ex.com/c"),
      "the specific stanza replaces * for its agent")
    assert(evil("http://other.org/a/x"), "no rules for the other host")
  }

  test("SRT: CRLF cues, multi-line text, malformed time -> null, " +
    "hour-scale millis") {
    val srt = "1\r\n00:00:01,600 --> 00:00:04,200\r\nline one\r\n" +
      "line two\r\n\r\n2\r\nnot a time line\r\nbody\r\n\r\n" +
      "3\r\n01:02:03,004 --> 01:02:10,500\r\ntail\r\n"
    val f = Files.createTempFile("graft-srt", ".srt")
    Files.writeString(f, srt)
    val rows = graft.sources.Srt.read(spark, f.toString)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) == 1600L &&
      rows(1L).getLong(2) == 4200L &&
      rows(1L).getAs[String]("text") == "line one\nline two" &&
      rows(1L).getAs[Long]("duration_ms") == 2600L)
    assert(rows(2L).isNullAt(1) && rows(2L).isNullAt(2))
    assert(rows(3L).getLong(1) == 3723004L &&
      rows(3L).getLong(2) == 3730500L)
    Files.deleteIfExists(f)
  }

  test("resolveHref: scheme pass-through, protocol-relative, rooted, " +
    "directory-relative, fragment strip, pathless base") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      ("http://example.com/a/b.html", "https://x.org/p",
        "https://x.org/p"),
      ("http://example.com/a/b.html", "mailto:a@b", "mailto:a@b"),
      ("https://example.com/a/b.html", "//cdn.org/q",
        "https://cdn.org/q"),
      ("http://example.com/a/b.html", "/root.html",
        "http://example.com/root.html"),
      ("http://example.com/a/b.html", "rel.html",
        "http://example.com/a/rel.html"),
      ("http://example.com/a/b.html", "rel.html#frag",
        "http://example.com/a/rel.html"),
      ("http://example.com", "x", "http://example.com/x"))
    val got = cases.toDF("base", "href", "want")
      .select(graft.sources.Warc.resolveHref(col("base"), col("href"))
        .as("got"), col("want"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got ${r.getString(0)}, want ${r.getString(1)}"))
  }
}
