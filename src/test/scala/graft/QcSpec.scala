package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.VcfStats
import graft.sources.{Sam, Vcf}
import graft.functions.text

/** Hand-computed cases for the round-11 QC/crawl operators: flagstat
  * counter semantics (mate bits, diff-chrom RNEXT '='), variant-class /
  * ti-tv arithmetic, Mendelian dosage intervals, the VCF writer round
  * trip, URL canonicalization edge cases and the boilerplate heuristics.
  */
class QcSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("qc-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("flagstat counts the 12 samtools counters") {
    val s = spark
    import s.implicits._
    // (flag, rname, rnext): a proper pair on the same chrom ('='), a
    // mate-on-other-chrom pair, a singleton (mate unmapped, 0x8), an
    // unmapped read, a secondary+duplicate, an unpaired mapped read
    val reads = Seq(
      (1 + 2 + 64, "1", "="),     // paired, proper, read1, mate same
      (1 + 128, "1", "X"),        // paired, read2, mate on X
      (1 + 8, "1", null),         // paired, mate unmapped -> singleton
      (4, null, null),            // unmapped
      (256 + 1024, "1", null),    // secondary duplicate
      (0, "1", null)              // unpaired mapped
    ).toDF("flag", "rname", "rnext")
    val m = Sam.flagstat(reads).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("total") == 6)
    assert(m("secondary") == 1)
    assert(m("supplementary") == 0)
    assert(m("duplicates") == 1)
    assert(m("mapped") == 5)
    assert(m("paired") == 3)
    assert(m("read1") == 1)
    assert(m("read2") == 1)
    assert(m("properly_paired") == 1)
    // mate-mapped = paired && mapped && !0x8 -> rows 1 and 2
    assert(m("with_itself_and_mate_mapped") == 2)
    assert(m("singletons") == 1)
    // row 2: rnext 'X' != rname '1'; row 1's '=' means same -> excluded
    assert(m("mate_diff_chrom") == 1)
  }

  test("variantStats classifies SNV/ins/del/MNP and computes ti/tv") {
    val s = spark
    import s.implicits._
    val v = Seq(
      ("1", "A", "G"),   // SNV transition
      ("1", "C", "T"),   // SNV transition
      ("1", "A", "C"),   // SNV transversion
      ("1", "A", "AT"),  // insertion
      ("1", "ACG", "A"), // deletion
      ("1", "AC", "GT"), // MNP
      ("2", "G", "C")    // SNV transversion, other chrom
    ).toDF("chrom", "ref", "alt")
    val out = VcfStats.variantStats(v).collect()
      .map(r => r.getString(0) -> r).toMap
    val c1 = out("1")
    assert(c1.getLong(1) == 6 && c1.getLong(2) == 3)      // n_variants, n_snp
    assert(c1.getLong(3) == 1 && c1.getLong(4) == 1)      // n_ins, n_del
    assert(c1.getLong(5) == 1)                            // n_mnp
    assert(c1.getLong(6) == 2 && c1.getLong(7) == 1)      // n_ti, n_tv
    assert(c1.getDouble(8) == 2.0)                        // ti_tv
    val c2 = out("2")
    assert(c2.getLong(7) == 1 && c2.isNullAt(8) == false) // tv=1 -> 0.0
    assert(c2.getDouble(8) == 0.0)
  }

  test("mendelViolations flags dosages outside the parental interval") {
    val s = spark
    import s.implicits._
    // v1: child 1|1 but dad 0|0 -> child max = (mom>=1)+(dad>=1) = 1 < 2
    // v2: child 0|0, mom 1|1 -> child min = 1 > 0 -> violation
    // v3: consistent het child
    // v4: child genotype missing -> row dropped
    val gts = Seq(
      ("v1", "1", 10L, "C", "1|1"), ("v1", "1", 10L, "M", "1|0"),
      ("v1", "1", 10L, "D", "0|0"),
      ("v2", "1", 20L, "C", "0|0"), ("v2", "1", 20L, "M", "1|1"),
      ("v2", "1", 20L, "D", "0|0"),
      ("v3", "1", 30L, "C", "1|0"), ("v3", "1", 30L, "M", "1|1"),
      ("v3", "1", 30L, "D", "0|0"),
      ("v4", "1", 40L, "C", ".|."), ("v4", "1", 40L, "M", "0|0"),
      ("v4", "1", 40L, "D", "0|0")
    ).toDF("varId", "chrom", "pos", "sample", "gt")
    val trios = Seq(("C", "M", "D")).toDF("child", "mother", "father")
    val out = VcfStats.mendelViolations(gts, trios).collect()
      .map(r => r.getString(0) -> r.getBoolean(7)).toMap
    assert(out == Map("v1" -> true, "v2" -> true, "v3" -> false))
  }

  test("sampleSingletons: ac=1 carriers counted, hom-alt is not a " +
    "singleton, zero-singleton samples report 0") {
    val s = spark
    import s.implicits._
    val gts = Seq(
      ("v1", "Sa", "0|1"), ("v1", "Sb", "0|0"), ("v1", "Sc", "0|0"),
      ("v2", "Sa", "0|1"), ("v2", "Sb", "1|0"), ("v2", "Sc", "0|0"),
      ("v3", "Sa", "1|1"), ("v3", "Sb", "0|0"), ("v3", "Sc", "0|0"),
      ("v4", "Sa", "0|0"), ("v4", "Sb", "0|1"), ("v4", "Sc", ".|.")
    ).toDF("varId", "sample", "gt")
    val out = graft.operators.VcfStats.sampleSingletons(gts).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("Sa" -> 1L, "Sb" -> 1L, "Sc" -> 0L))
  }

  test("siteFrequencySpectrum folds to the minor allele and bins by " +
    "allele number") {
    val s = spark
    import s.implicits._
    // v1: ac=3 of an=6 -> mac 3; v2: ac=5 of 6 -> folds to 1;
    // v3: one missing call -> an=4, ac=1 -> mac 1
    val gts = Seq(
      ("v1", "0|0"), ("v1", "0|1"), ("v1", "1|1"),
      ("v2", "1|1"), ("v2", "1|1"), ("v2", "1|0"),
      ("v3", "0|0"), ("v3", ".|."), ("v3", "0|1")
    ).toDF("varId", "gt")
    val out = VcfStats.siteFrequencySpectrum(gts).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map((6L, 3L) -> 1L, (6L, 1L) -> 1L, (4L, 1L) -> 1L))
  }

  test("tdt counts het-parent transmissions; Mendel violations and " +
    "uninformative trios handled") {
    val s = spark
    import s.implicits._
    // v1: het mom, hom-ref dad, het child -> mom transmitted ALT (1/0)
    // v2: both het, het child -> one ALT one REF (1/1)
    // v3: both het, hom-ref child -> two REF (0/2)
    // v4: hom-alt mom, hom-ref dad -> forced, zero informative, chi2 null
    // v5: child 1|1 from 0|0 x 0|0 -> Mendel violation, variant absent
    // v6: missing child call -> dropped, variant absent
    val gts = Seq(
      ("v1", "C", "1|0"), ("v1", "M", "0|1"), ("v1", "D", "0|0"),
      ("v2", "C", "1|0"), ("v2", "M", "1|0"), ("v2", "D", "0|1"),
      ("v3", "C", "0|0"), ("v3", "M", "1|0"), ("v3", "D", "0|1"),
      ("v4", "C", "1|0"), ("v4", "M", "1|1"), ("v4", "D", "0|0"),
      ("v5", "C", "1|1"), ("v5", "M", "0|0"), ("v5", "D", "0|0"),
      ("v6", "C", ".|."), ("v6", "M", "1|0"), ("v6", "D", "0|0")
    ).map { case (v, smp, gt) => (v, "1", 10L, smp, gt) }
      .toDF("varId", "chrom", "pos", "sample", "gt")
    val trios = Seq(("C", "M", "D")).toDF("child", "mother", "father")
    val out = VcfStats.tdt(gts, trios).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5),
          if (r.isNullAt(6)) None else Some(r.getDouble(6))))).toMap
    assert(out.keySet == Set("v1", "v2", "v3", "v4"))
    assert(out("v1") == ((1L, 1L, 0L, Some(1.0))))
    assert(out("v2") == ((1L, 1L, 1L, Some(0.0))))
    assert(out("v3") == ((1L, 0L, 2L, Some(2.0))))
    assert(out("v4") == ((0L, 0L, 0L, None)))
  }

  test("VCF writer round-trips normalized rows through the parser") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      ("1", 19L, "rs1", "C", "G", Some(0.25), Seq("1|0", "0|1")),
      ("X", 5L, "rs2", "A", "T", Option.empty[Double],
        Seq("0|0", "1|1")))
      .toDF("chrom", "pos", "id", "ref", "alt", "allele_af", "genotypes")
    val out = s"${sys.props("java.io.tmpdir")}/graft-vcfw-test-" +
      ProcessHandle.current.pid
    Vcf.writeVariants(rows, out)
    val back = Vcf.read(s, out)
      .select(col("chrom"), col("pos"), col("id"), col("ref"), col("alt"),
        col("af").cast("double").as("allele_af"),
        array_join(col("genotypes"), ",").as("g"))
      .collect().map(r => r.getString(2) -> r).toMap
    assert(back("rs1").getDouble(5) == 0.25)
    assert(back("rs1").getString(6) == "1|0,0|1")
    assert(back("rs2").isNullAt(5))  // INFO '.' -> af null
    assert(back("rs2").getLong(1) == 5L)
  }

  test("pileup maps read bases through D/I/S CIGAR ops to the right " +
    "reference positions") {
    val s = spark
    import s.implicits._
    import graft.operators.Pileup
    val reads = Seq(
      ("1", 10L, "3M", "ACG"),        // 10:A 11:C 12:G
      ("1", 11L, "1M1D2M", "CTT"),    // 11:C, D skips 12, 13:T 14:T
      ("1", 10L, "2M1I1M", "AAGC"),   // 10:A 11:A, I consumes G, 12:C
      ("1", 20L, "2S2M", "GGTT")      // clips consume read: 20:T 21:T
    ).toDF("chrom", "pos", "cigar", "seq")
    val out = Pileup.baseCounts(reads).collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(out(10L) == ((2L, 0L, 0L, 0L, 2L))) // A,A
    assert(out(11L) == ((1L, 2L, 0L, 0L, 3L))) // C,C,A
    assert(out(12L) == ((0L, 1L, 1L, 0L, 2L))) // G (3M), C (after I)
    assert(out(13L) == ((0L, 0L, 0L, 1L, 1L)))
    assert(out(20L) == ((0L, 0L, 0L, 1L, 1L))) // soft clip skipped
    assert(!out.contains(22L))
  }

  test("variant calls pick the best non-ref base over depth/VAF floors") {
    val s = spark
    import s.implicits._
    import graft.operators.Pileup
    // pos 10: ref A, 2xA -> no alt support, no call
    // pos 11: ref G, C+C+A -> alt C at vaf 2/3, called
    // pos 12: ref G, G+C -> alt C vaf 0.5, called at minVaf 0.5
    // pos 13: depth 1 -> below minDepth
    val reads = Seq(
      ("1", 10L, "3M", "ACG"),
      ("1", 11L, "1M1D2M", "CTT"),
      ("1", 10L, "2M1I1M", "AAGC"))
      .toDF("chrom", "pos", "cigar", "seq")
    val ref = Seq(("1", 10L, "A"), ("1", 11L, "G"), ("1", 12L, "G"),
      ("1", 13L, "T"), ("1", 14L, "T")).toDF("chrom", "pos", "ref")
    val out = Pileup.callVariants(reads, ref, minDepth = 2, minVaf = 0.5)
      .collect().map(r => r.getLong(1) ->
        ((r.getString(2), r.getString(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(out(11L) == (("G", "C", 3L, 2L, 0.66667)))
    assert(out(12L) == (("G", "C", 2L, 1L, 0.5)))
    assert(!out.contains(10L) && !out.contains(13L) && !out.contains(14L))
  }

  test("kmer counting: canonical folding, N-dropping, short-seq guard") {
    val s = spark
    import s.implicits._
    import graft.operators.Kmers
    val reads = Seq("ACGTA", "ACGNA", "AC").toDF("sequence")
    val counts = Kmers.kmerCounts(reads, "sequence", k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ACGTA -> ACG, CGT (canonical ACG: revcomp(CGT)=ACG), GTA;
    // ACGNA contributes only ACG (CGN/GNA touch N); "AC" too short
    assert(counts == Map("ACG" -> 3L, "GTA" -> 1L))
    val spec = Kmers.spectrum(
      Kmers.kmerCounts(reads, "sequence", k = 3)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(spec == Map(3L -> 1L, 1L -> 1L))
    // non-canonical keeps strands distinct
    val raw = Kmers.kmerCounts(reads, "sequence", k = 3,
      canonical = false).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(raw == Map("ACG" -> 2L, "CGT" -> 1L, "GTA" -> 1L))
  }

  test("FASTQ reader survives '@'-leading quality lines and forced " +
    "multi-split reads") {
    import graft.sources.Fastq
    val path = s"${graft.fixtures.GenomicFixtures.rawDir}/reads.fastq"
    val rows = Fastq.read(spark, path).collect()
      .map(r => r.getString(1) ->
        ((Option(r.getString(2)), r.getString(3), r.getString(4),
          r.getBoolean(5)))).toMap
    assert(rows.size == 4)
    // r2's quality starts with '@' — the record a "\n@" splitter would
    // cut in half; the line-ordinal reader keeps it intact
    assert(rows("r2") ==
      ((None, "GGGGCCCCAAAATTTT", "@ABCDEFGHIJKLMNO", true)))
    // r3: '+'-leading quality, description after the id
    assert(rows("r3") ==
      ((Some("sample=x"), "ACGTNNACGT", "+IIIIIIII@", true)))
    assert(rows("r1")._1 == Some("len=30"))
    // splittability: force many tiny splits — the record-ordinal
    // assembly must produce the identical 4 records
    val split = Fastq.read(spark, path, minPartitions = 7).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getString(4))).sortBy(_._1)
    val whole = Fastq.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(3),
        r.getString(4))).sortBy(_._1)
    assert(split.toSeq == whole.toSeq)
  }

  test("canonicalUrl: case, ports, fragments, tracking, param order") {
    val s = spark
    import s.implicits._
    val cases = Seq(
      // scheme+host lowercased, :80 dropped for http, fragment dropped,
      // utm stripped, params sorted
      ("HTTP://Ex.COM:80/A/b?z=1&utm_source=x&a=2#frag",
        "http://ex.com/A/b?a=2&z=1"),
      // :443 kept for http (not the scheme default)
      ("http://ex.com:443/p", "http://ex.com:443/p"),
      // :443 dropped for https
      ("https://Ex.com:443/p?gclid=9", "https://ex.com/p"),
      // empty path -> '/', empty query dropped
      ("https://ex.com?utm_campaign=c", "https://ex.com/"),
      // path case preserved
      ("http://ex.com/CaseSensitive", "http://ex.com/CaseSensitive"))
      .toDF("url", "expected")
    val bad = cases
      .withColumn("got", text.canonicalUrl(col("url")))
      .where(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("boilerplate heuristics fire and abstain line-wise") {
    val s = spark
    import s.implicits._
    val page = Seq(Tuple1(Seq(
      "Home | About | Contact",      // nav bar -> removed
      "Read The Full Story",         // 4 words -> kept
      "About Us",                    // nav link -> removed
      "some body text with Real content here.", // kept
      "© 2026 corp",                 // copyright -> removed
      "all Rights Reserved by us",   // copyright (case-insens) -> removed
      "thanks for reading.",         // lowercase + '.' -> kept
      "Privacy Policy"               // nav link -> removed
    ).mkString("\n"))).toDF("page")
    val r = page.select(text.stripBoilerplate(col("page")).as("s"))
      .select(col("s.clean_text"), col("s.n_removed")).head
    assert(r.getLong(1) == 5)
    assert(r.getString(0) ==
      Seq("Read The Full Story",
        "some body text with Real content here.",
        "thanks for reading.").mkString("\n"))
  }

  test("bpeEncode applies merges in rank order with the replace-twice " +
    "fixpoint") {
    val s = spark
    import s.implicits._
    val merges = Seq(("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
      ("a", "b"))
    val rows = Seq(
      // chained merges assemble the full word
      ("table", Seq("table")),
      // rank order: t+a fires first, so a+b never sees "ab" inside "tab"
      ("tab", Seq("tab")),
      // back-to-back occurrences: the second replace pass catches the
      // occurrence whose leading space pass one consumed
      ("abab", Seq("ab", "ab")),
      // untouched word stays characters
      ("xyz", Seq("x", "y", "z")),
      // multi-word text flattens in word order
      ("table xyz", Seq("table", "x", "y", "z")))
      .toDF("text", "expected")
    val bad = rows
      .withColumn("got", text.bpeEncode(col("text"), merges))
      .where(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("urlDedup collapses canonical-equal variants to one row") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "http://a.com/x?b=1&a=1"),
      (2L, "HTTP://A.COM:80/x?a=1&b=1&utm_source=s#f"),
      (3L, "http://a.com/y"))
      .toDF("doc_id", "url")
    val out = graft.operators.Dedup.urlDedup(docs, "doc_id", "url")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out("http://a.com/x?a=1&b=1") == ((2L, 1L, "1;2")))
    assert(out("http://a.com/y") == ((1L, 3L, "3")))
  }

  test("g49 annotate: multi-hit names comma-join sorted, chr prefix " +
    "normalized, unannotated variants survive with null") {
    val rows = graft.queries.Genomic
      .queries("g49_annotate")(spark, "unused")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(4))))
    // rs11 at 1:150 sits in promoter_A [101,200] AND tss_G [121,160] —
    // names sorted; the BED said chr1, the VCF says 1
    assert(rows.filter(t => t._1 == "1" && t._2 == 150L)
      .map(_._3).toSeq == Seq(Some("promoter_A,tss_G")))
    // everything else in the fixture is outside every region (incl.
    // both rs5 multi-allelic split rows at 1:31)
    assert(rows.length == 13 && rows.count(_._3.isEmpty) == 12)
  }

  test("mergeCohorts: site union, A-first concat, per-side ./. padding " +
    "at each cohort's own width, multi-allelic rows merge per allele") {
    val s = spark
    import s.implicits._
    val a = Seq(
      ("1", 10L, "v1", "A", "T", Seq("0|1", "0|0")),
      ("1", 20L, "v2", "C", "G", Seq("1|1", "0|1")),
      ("1", 20L, "v2", "C", "T", Seq("0|0", "0|1")))
      .toDF("chrom", "pos", "id", "ref", "alt", "genotypes")
    val b = Seq(
      ("1", 10L, "v1", "A", "T", Seq("1|0", "0|0", "0|1")),
      ("1", 20L, "v2", "C", "G", Seq("0|0", "0|0", "1|0")),
      ("1", 30L, "v3", "G", "A", Seq("0|1", "0|0", "0|0")))
      .toDF("chrom", "pos", "id", "ref", "alt", "genotypes")
    val out = graft.sources.Vcf.mergeCohorts(a, b).collect()
      .map(r => (r.getString(2), r.getString(4)) ->
        r.getSeq[String](5).mkString(",")).toMap
    assert(out.size == 4)
    assert(out(("v1", "T")) == "0|1,0|0,1|0,0|0,0|1")
    // shared site, same allele: plain concat
    assert(out(("v2", "G")) == "1|1,0|1,0|0,0|0,1|0")
    // the C>T allele exists only in cohort A -> B-width padding
    assert(out(("v2", "T")) == "0|0,0|1,./.,./.,./.")
    // v3 exists only in cohort B -> A-width padding first
    assert(out(("v3", "A")) == "./.,./.,0|1,0|0,0|0")
  }

  test("slop: symmetric pad clips to genome bounds, unknown chrom " +
    "passes un-clipped, beyond-end interval collapses to boundary stub") {
    val s = spark
    import s.implicits._
    val iv = Seq(("1", 101L, 200L, "a"), ("1", 381L, 420L, "b"),
      ("2", 1L, 1000L, "c")).toDF("chrom", "start", "end", "name")
    val genome = Seq(("1", 180L)).toDF("chrom", "length")
    val out = graft.operators.Intervals.slop(iv, genome, 30, 30)
      .collect().map(r => r.getString(3) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((71L, 180L)))   // end clipped to len 180
    assert(out("b") == ((180L, 180L)))  // fully beyond -> boundary stub
    assert(out("c") == ((1L, 1030L)))   // chrom 2 unknown -> un-clipped
  }

  test("hetStats: Nei-corrected expected hom, F pins — all-hom sample " +
    "F=1, het-excess F<0, missing call shrinks N") {
    val s = spark
    import s.implicits._
    // v1: s1 0|0, s2 0|1, s3 1|1, s4 0|0 -> ac 3, an 8
    // v2: s1 0|1, s2 0|1, s3 missing, s4 1|1 -> ac 4, an 6
    val gts = Seq(
      ("v1", "s1", "0|0"), ("v1", "s2", "0|1"),
      ("v1", "s3", "1|1"), ("v1", "s4", "0|0"),
      ("v2", "s1", "0|1"), ("v2", "s2", "0|1"),
      ("v2", "s3", ".|."), ("v2", "s4", "1|1"))
      .toDF("varId", "sample", "gt")
    val out = VcfStats.hetStats(gts).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 4)
    // hand terms: v1 e = 1 - 2*(3/8)*(5/8)*(8/7) = 0.464285714 (9dp),
    //             v2 e = 1 - 2*(2/3)*(1/3)*(6/5) = 0.466666667
    val e1 = 0.464285714; val e2 = 0.466666667
    def f(o: Long, n: Long, e: Double) = (o - e) / (n - e)
    val s1 = out("s1") // v1 hom, v2 het: O=1 N=2
    assert(s1.getLong(1) == 1 && s1.getLong(3) == 2)
    assert(math.abs(s1.getDouble(2) - (e1 + e2)) < 1e-5)
    assert(math.abs(s1.getDouble(4) - f(1, 2, e1 + e2)) < 1e-5)
    // s2 all-het: F strongly negative
    assert(out("s2").getLong(1) == 0 &&
      out("s2").getDouble(4) < -0.8)
    // s3: only v1 called (missing v2 call invisible), all hom -> F = 1
    assert(out("s3").getLong(3) == 1 &&
      out("s3").getDouble(4) == 1.0)
    // s4 all-hom across both variants -> F = 1
    assert(out("s4").getLong(1) == 2 && out("s4").getDouble(4) == 1.0)
  }

  test("hardyWeinberg: counts, MAF, chi-square; monomorphic -> null") {
    val s = spark
    import s.implicits._
    // v1: 2 hom-ref, 1 het, 1 hom-alt (n=4, p=3/8); v2 monomorphic ref;
    // a missing call drops from v1's denominator
    val gts = Seq(
      ("v1", "1", 10L, "a", "0|0"), ("v1", "1", 10L, "b", "0|0"),
      ("v1", "1", 10L, "c", "0|1"), ("v1", "1", 10L, "d", "1|1"),
      ("v1", "1", 10L, "e", ".|."),
      ("v2", "1", 20L, "a", "0|0"), ("v2", "1", 20L, "b", "0|0"))
      .toDF("varId", "chrom", "pos", "sample", "gt")
    val out = VcfStats.hardyWeinberg(gts).collect()
      .map(r => r.getString(0) -> r).toMap
    val v1 = out("v1")
    assert(v1.getLong(3) == 4 && v1.getLong(4) == 2 &&
      v1.getLong(5) == 1 && v1.getLong(6) == 1)
    // p = (2*1+1)/8 = 0.375, maf = 0.375, obs_het = 0.25,
    // exp_het = 2*0.375*0.625 = 0.46875
    assert(v1.getDouble(7) == 0.375 && v1.getDouble(8) == 0.25)
    assert(v1.getDouble(9) == 0.46875)
    // chi2: exp = (1.5625, 1.875, 0.5625); obs = (2, 1, 1)
    // = 0.1225 + 0.40833... + 0.34027... = 0.87111
    assert(math.abs(v1.getDouble(10) - 0.87111) < 1e-9)
    val v2 = out("v2")
    assert(v2.getDouble(7) == 0.0 && v2.isNullAt(10),
      "monomorphic variant must have maf 0 and null chi2")
  }

  test("rohSegments: het breaks the run, missing calls are invisible") {
    val s = spark
    import s.implicits._
    // sample a, chrom 1: hom(10), hom(20), missing(30), hom(40) -- one
    // run of 3 (missing is dropped, not a break); het(50) breaks; then
    // hom(60), hom(70) -- a second run of 2. Chrom 2: single hom -> below
    // minVariants.
    val gts = Seq(
      ("a", "1", 10L, "x1", "0|0"), ("a", "1", 20L, "x2", "1|1"),
      ("a", "1", 30L, "x3", ".|."), ("a", "1", 40L, "x4", "0|0"),
      ("a", "1", 50L, "x5", "0|1"),
      ("a", "1", 60L, "x6", "1|1"), ("a", "1", 70L, "x7", "0|0"),
      ("a", "2", 10L, "y1", "0|0"))
      .toDF("sample", "chrom", "pos", "varId", "gt")
    val runs = VcfStats.rohSegments(gts, minVariants = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(runs == Set(("a", "1", 10L, 40L, 3L), ("a", "1", 60L, 70L, 2L)))
  }

  test("genotypeConcordance: every counter class lands where it should") {
    val s = spark
    import s.implicits._
    // sample a: v1 concordant (1|0 vs 0|1 -- same dosage), v2 discordant,
    // v3 left-only (right missing call), v4 right-only (left missing)
    val left = Seq(
      ("v1", "a", "1|0"), ("v2", "a", "0|0"), ("v3", "a", "1|1"),
      ("v4", "a", ".|."))
      .toDF("varId", "sample", "gt")
    val right = Seq(
      ("v1", "a", "0|1"), ("v2", "a", "1|1"), ("v3", "a", "./."),
      ("v4", "a", "0|1"))
      .toDF("varId", "sample", "gt")
    val r = VcfStats.genotypeConcordance(left, right).collect().head
    assert(r.getLong(1) == 1 && r.getLong(2) == 1 &&
      r.getLong(3) == 1 && r.getLong(4) == 1)
    assert(r.getDouble(5) == 0.5)
  }

  test("gcWindows: short tail window, N exclusion, soft-mask case") {
    val s = spark
    import s.implicits._
    // 10 bases + a 2-base tail at windowSize 10; lowercase gc counts,
    // N excluded from the denominator
    val seqs = Seq(("c1", "ATGCatgcNN" + "GC"))
      .toDF("chrom", "sequence")
    val out = graft.operators.SeqStats.gcWindows(seqs, windowSize = 10)
      .orderBy("win_start").collect()
    assert(out.length == 2)
    val w1 = out(0)
    assert(w1.getLong(1) == 1 && w1.getLong(2) == 10)
    assert(w1.getLong(3) == 4 && w1.getLong(4) == 4 && w1.getLong(5) == 2)
    assert(w1.getDouble(6) == 0.5)
    val w2 = out(1)
    assert(w2.getLong(1) == 11 && w2.getLong(2) == 12)
    assert(w2.getLong(3) == 0 && w2.getLong(4) == 2)
    assert(w2.getDouble(6) == 1.0)
  }

  test("depthHistogram weighs segments by base span") {
    val s = spark
    import s.implicits._
    // [1,10] and [6,15]: depth 1 on 1-5 and 11-15 (10 bases), depth 2
    // on 6-10 (5 bases)
    val iv = Seq(("1", 1L, 10L), ("1", 6L, 15L))
      .toDF("chrom", "start", "end")
    val hist = graft.operators.Coverage.depthHistogram(
      graft.operators.Coverage.coverage(iv)).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hist == Map(1L -> 10L, 2L -> 5L))
  }

  test("ldPairs: perfect LD r2=1, window bound, monomorphic -> null") {
    val s = spark
    import s.implicits._
    // v1(pos 10) and v2(pos 20): identical dosage vectors -> r2 = 1
    // v3(pos 25): anti-correlated with v1 -> r2 = 1 as well (sign-free)
    // v4(pos 200): outside the 50bp window of all others
    // v5(pos 30): monomorphic -> r2 null in every pair
    val gts = Seq(
      ("v1", 10L, Seq(0, 1, 2, 1)), ("v2", 20L, Seq(0, 1, 2, 1)),
      ("v3", 25L, Seq(2, 1, 0, 1)), ("v4", 200L, Seq(0, 1, 2, 1)),
      ("v5", 30L, Seq(1, 1, 1, 1)))
      .flatMap { case (v, pos, ds) =>
        ds.zipWithIndex.map { case (d, i) =>
          (v, "1", pos, s"s$i", if (d == 0) "0|0"
            else if (d == 1) "0|1" else "1|1") } }
      .toDF("varId", "chrom", "pos", "sample", "gt")
    val out = graft.operators.VcfStats.ldPairs(gts, maxDist = 50)
      .collect().map(r => (r.getString(1), r.getString(3)) ->
        (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(out(("v1", "v2")) == Some(1.0))
    assert(out(("v1", "v3")) == Some(1.0))
    assert(out(("v1", "v5")) == None, "monomorphic partner -> null r2")
    assert(!out.keySet.exists(p => p._1 == "v4" || p._2 == "v4"),
      "pairs beyond maxDist must not appear")
    // every reported pair is ordered pos1 < pos2 and reported once
    assert(out.keySet == Set(("v1","v2"), ("v1","v3"), ("v1","v5"),
      ("v2","v3"), ("v2","v5"), ("v3","v5")))
  }

  test("fstHudson: fixed difference -> 1, equal freqs -> ~0 correction") {
    val s = spark
    import s.implicits._
    def rows(v: String, pos: Long, a: Seq[Int], b: Seq[Int]) = {
      def gt(d: Int) = if (d == 0) "0|0" else if (d == 1) "0|1" else "1|1"
      a.zipWithIndex.map { case (d, i) =>
        (v, "1", pos, s"a$i", "A", gt(d)) } ++
        b.zipWithIndex.map { case (d, i) =>
          (v, "1", pos, s"b$i", "B", gt(d)) }
    }
    // v1: fixed difference (p1=1, p2=0) -> fst 1
    // v2: identical freqs p=0.5 -> fst = negative correction / 0.5
    val gts = (rows("v1", 10L, Seq(2, 2), Seq(0, 0)) ++
      rows("v2", 20L, Seq(1, 1), Seq(1, 1)))
      .toDF("varId", "chrom", "pos", "sample", "pop", "gt")
    val out = graft.operators.VcfStats.fstHudson(gts, "A", "B")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(7)) None else Some(r.getDouble(7)))).toMap
    assert(out("v1") == Some(1.0))
    // hand: p1=p2=0.5, n=4 alleles each: num = 0 - .25/3 - .25/3 = -1/6
    // den = .25 + .25 = .5 -> fst = -1/3
    assert(out("v2") == Some(BigDecimal(-1.0 / 6 / 0.5)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble))
  }

  test("readStats: primary filter, base totals, proper-pair insert size") {
    val s = spark
    import s.implicits._
    // primary mapped (len 4, mapq 60), proper-pair leftmost (tlen 100,
    // len 3, mapq 40), its mate (tlen -100 -> excluded from insert),
    // secondary (excluded everywhere), unmapped (counts as primary, no
    // mapq contribution), seq-less primary (no length contribution)
    val reads = Seq(
      (0, Some(10L), 60, 0L, Some("ACGT"), false, false, false),
      (67, Some(20L), 40, 100L, Some("ACG"), true, false, false),
      (131, Some(120L), 40, -100L, Some("ACG"), true, false, false),
      (256, Some(30L), 20, 0L, Some("A"), false, true, false),
      (4, Option.empty[Long], 0, 0L, Some("AC"), false, false, true),
      (0, Some(40L), 30, 0L, Option.empty[String], false, false, false))
      .toDF("flag", "pos", "mapq", "tlen", "seq",
        "is_proper_pair", "is_secondary", "is_unmapped")
    val r = graft.sources.Sam.readStats(reads).collect().head
    assert(r.getLong(0) == 5L, "primary")
    assert(r.getLong(1) == 4L, "mapped")
    assert(r.getLong(2) == 4 + 3 + 3 + 2, "total bases excl. secondary")
    assert(r.getDouble(3) == 3.0, "avg len (4+3+3+2)/4")
    assert(r.getDouble(4) == 42.5, "avg mapq (60+40+40+30)/4")
    assert(r.getDouble(5) == 100.0, "insert from the leftmost mate only")
  }

  test("targetBreadth: union length never double-counts, clips to the " +
    "target, empty targets at 0") {
    val s = spark
    import s.implicits._
    // target [10,29] (20 bases): reads [5,14] and [12,21] overlap each
    // other -> union [10,21] = 12 covered bases (clip at 10);
    // target [100,109] has no reads
    val reads = Seq(("1", 5L, 14L), ("1", 12L, 21L))
      .toDF("chrom", "start", "end")
    val targets = Seq(("1", "T1", 10L, 29L), ("1", "T2", 100L, 109L))
      .toDF("chrom", "transcript_id", "start2", "end2")
    val out = graft.operators.Coverage.targetBreadth(reads, targets)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(4), r.getDouble(5)))).toMap
    assert(out("T1") == ((12L, 0.6)))
    assert(out("T2") == ((0L, 0.0)))
  }

  test("scriptCounts: per-script tallies and non-whitespace fractions") {
    val s = spark
    import s.implicits._
    val out = Seq(("ab 12 \u4e2d\u6587 \u0434\u0430"))
      .toDF("t")
      .select(text.scriptCounts(col("t")).as("_s")).select(col("_s.*"))
      .collect().head
    // "ab 12 中文 да": 11 chars, 3 spaces -> denom 8
    assert(out.getLong(0) == 11L)
    assert(out.getLong(1) == 2L && out.getLong(2) == 2L)
    assert(out.getLong(3) == 2L && out.getLong(4) == 2L)
    assert(out.getLong(5) == 0L && out.getLong(6) == 0L)
    assert(out.getDouble(7) == 0.25 && out.getDouble(8) == 0.25 &&
      out.getDouble(9) == 0.25)
  }

  test("sexCheck: hemizygous-coded male passes, het male flags, " +
    "missing declared sex never flags") {
    val s = spark
    import s.implicits._
    val gts = Seq(
      // m1: 0 hets of 3 called -> male
      ("m1", "x1", "0|0"), ("m1", "x2", "1|1"), ("m1", "x3", "0|0"),
      // f1: 2 hets of 3 -> female
      ("f1", "x1", "0|1"), ("f1", "x2", "1|0"), ("f1", "x3", "0|0"),
      // m2 declared male but het-rich -> mismatch
      ("m2", "x1", "0|1"), ("m2", "x2", "1|0"), ("m2", "x3", "0|1"),
      // u1: no declared sex
      ("u1", "x1", "0|1"), ("u1", "x2", ".|."))
      .map { case (sm, v, gt) => (sm, v, "X", 50L, gt) }
      .toDF("sample", "varId", "chrom", "pos", "gt")
    val meta = Seq(("m1", "male"), ("f1", "female"), ("m2", "male"))
      .toDF("sample", "sex")
    val out = graft.operators.VcfStats.sexCheck(gts, meta)
      .collect().map(r => r.getString(0) ->
        ((r.getString(4), r.getBoolean(6)))).toMap
    assert(out("m1") == (("male", false)))
    assert(out("f1") == (("female", false)))
    assert(out("m2") == (("female", true)), "declared male, looks female")
    assert(out("u1") == (("female", false)),
      "no declared sex -> never a mismatch")
  }

  test("multiinter: atomic segments, uncovered gaps omitted, " +
    "within-set overlap pre-merged") {
    val s = spark
    import s.implicits._
    val a = Seq(("1", 1L, 8L), ("1", 6L, 10L)) // overlapping -> [1,10]
      .toDF("chrom", "start", "end")
    val b = Seq(("1", 5L, 20L)).toDF("chrom", "start", "end")
    val c = Seq(("1", 30L, 35L)).toDF("chrom", "start", "end")
    val out = graft.operators.Intervals.multiinter(
      Seq("A" -> a, "B" -> b, "C" -> c), Seq("chrom"), binSize = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getString(4)))).toMap
    assert(out == Map(
      (1L, 4L) -> ((1L, "A")),
      (5L, 10L) -> ((2L, "A;B")),
      (11L, 20L) -> ((1L, "B")),
      (30L, 35L) -> ((1L, "C"))),
      s"got $out — the uncovered [21,29] gap must be absent")
  }

  test("grmPairs + pcaFromGrm: duplicate pairs equal the diagonal, " +
    "opposite blocks go negative, PC1 separates the blocks") {
    val s = spark
    import s.implicits._
    // two 2-sample blocks with opposite homozygous genotypes at 4
    // variants -> p = 0.5 everywhere; within-block grm == diagonal,
    // cross-block == -diagonal; PC1 loadings split the blocks by sign
    val gts = (for {
      v <- Seq("v1", "v2", "v3", "v4")
      (sm, gt) <- Seq("a" -> "0|0", "b" -> "0|0",
        "c" -> "1|1", "d" -> "1|1")
    } yield (v, "1", 10L, sm, gt))
      .toDF("varId", "chrom", "pos", "sample", "gt")
    val grm = VcfStats.grmPairs(gts)
    val g = grm.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(g.size == 10, "4 samples -> 10 upper-triangle pairs")
    assert(g(("a", "a")) == g(("a", "b")) && g(("c", "d")) == g(("a", "a")),
      "identical samples must tie the diagonal")
    assert(g(("a", "c")) == -g(("a", "a")),
      "opposite homozygotes at p=0.5 mirror the diagonal")
    assert(g(("a", "a")) > 1.9 && g(("a", "a")) < 2.1)
    val pcs = VcfStats.pcaFromGrm(grm, topK = 1).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(pcs("a") * pcs("b") > 0 && pcs("c") * pcs("d") > 0,
      "within-block loadings share sign")
    assert(pcs("a") * pcs("c") < 0, "PC1 must separate the blocks")
  }

  test("grmPcaDistributed replays pcaFromGrm at equal iteration count: " +
    "loadings and eigenvalues within 1e-3 (quantization only)") {
    val s = spark
    import s.implicits._
    // 8 samples: v%3==0 splits blocks {0-3}/{4-7} (PC1), v%3==1 splits
    // {0,1,4,5}/{2,3,6,7} (PC2), v%3==2 hash noise breaks degeneracy
    val gts = (for {
      v <- 0 until 24
      i <- 0 until 8
    } yield {
      val gt = v % 3 match {
        case 0 => if (i < 4) "0|0" else "1|1"
        case 1 => if (i % 4 < 2) "0|0" else "1|1"
        case _ =>
          val h = (i * 2654435761L + v * 40503L) % 5
          if (h < 1) "1|1" else if (h < 3) "0|1" else "0|0"
      }
      (s"v$v", "1", 10L + v, f"s$i", gt)
    }).toDF("varId", "chrom", "pos", "sample", "gt")
    val grm = VcfStats.grmPairs(gts).localCheckpoint()
    val mem = VcfStats.pcaFromGrm(grm, topK = 2, iters = 50).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val dist = VcfStats.grmPcaDistributed(grm, topK = 2, iters = 50)
      .collect()
    assert(dist.length == 16, "8 samples x 2 PCs")
    dist.foreach { r =>
      val (sm, pc) = (r.getString(0), r.getInt(1))
      val (ld, ev) = mem((sm, pc))
      assert(math.abs(r.getDouble(2) - ld) < 1e-3,
        s"loading($sm, pc$pc): ${r.getDouble(2)} vs in-memory $ld")
      assert(math.abs(r.getDouble(3) - ev) < 1e-3,
        s"eigenvalue(pc$pc): ${r.getDouble(3)} vs in-memory $ev")
    }
    // numpy.linalg.eigh ground truth for this GRM: lambda1 = 6.2541,
    // PC1 signs follow the i%4<2 sub-block split (+,+,-,-,+,+,-,-)
    val pc1 = dist.filter(_.getInt(1) == 1)
      .map(r => r.getString(0) -> r).toMap
    assert(math.abs(pc1("s0").getDouble(3) - 6.2541) < 1e-2,
      s"lambda1 ${pc1("s0").getDouble(3)} vs eigh 6.2541")
    (0 until 8).foreach { i =>
      val want = if (i % 4 < 2) 1.0 else -1.0
      assert(math.signum(pc1(s"s$i").getDouble(2)) == want,
        s"PC1 sign at s$i")
    }
  }

  test("windowedPi + tajimaD: per-site allele-count form, window " +
    "binning, rare-excess D < 0 < intermediate-excess D, invariant " +
    "window -> null") {
    val s = spark
    import s.implicits._
    def gts(rows: Seq[(String, Long, Seq[String])]) = rows.flatMap {
      case (v, pos, calls) => calls.zipWithIndex.map { case (gt, i) =>
        (v, "1", pos, s"s$i", gt)
      }
    }.toDF("varId", "chrom", "pos", "sample", "gt")
    // window 0: 4 rare singletons (ca=1/8 each); window 1: 4 balanced
    // (ca=4/8); window 2: monomorphic only
    val rare = Seq.tabulate(4)(k => (s"r$k", 10L + k,
      Seq("0|1", "0|0", "0|0", "0|0")))
    val bal = Seq.tabulate(4)(k => (s"b$k", 100L + k,
      Seq("0|1", "1|0", "0|1", "1|0")))
    val mono = Seq(("m0", 200L, Seq("0|0", "0|0", "0|0", "0|0")))
    val df = gts(rare ++ bal ++ mono)
    val pi = VcfStats.windowedPi(df, binSize = 50).collect()
      .map(r => r.getLong(1) -> r.getDouble(4)).toMap
    // per rare site: 7*1 / C(8,2)=28 -> 0.25; window sum 1.0
    assert(pi(0L) == 1.0, pi.toString)
    // per balanced site: 4*4/28 -> 0.571428..; sum 2.28571
    assert(math.abs(pi(100L) - 2.28571) < 1e-9, pi.toString)
    assert(pi(200L) == 0.0, "monomorphic window has pi 0")
    val d = VcfStats.tajimaD(df, nSequences = 8, binSize = 50).collect()
      .map(r => r.getLong(1) -> Option(r.get(5))).toMap
    assert(d(0L).exists(_.asInstanceOf[Double] < 0),
      s"rare excess must push D negative: $d")
    assert(d(100L).exists(_.asInstanceOf[Double] > 0),
      s"intermediate excess must push D positive: $d")
    assert(d(200L).isEmpty, "invariant window has undefined D")
  }

  test("ldPrune: greedy keep-earliest — the A~B, B~C, A!~C chain keeps " +
    "A AND C (naive drop-later-of-pair would kill C too)") {
    val s = spark
    import s.implicits._
    // 40 samples; hom-alt index sets chosen so r2(A,B)=r2(B,C)=0.81
    // and r2(A,C)=0.64 (one vs two 20-sample-block swaps)
    val aT = (0 until 20).toSet
    val bT = aT - 19 + 20
    val cT = aT - 19 - 18 + 20 + 21
    val rows = for {
      (v, pos, twos) <- Seq(("A", 10L, aT), ("B", 20L, bT),
        ("C", 30L, cT))
      i <- 0 until 40
    } yield (v, "1", pos, f"s$i%02d", if (twos(i)) "1|1" else "0|0")
    val df = rows.toDF("varId", "chrom", "pos", "sample", "gt")
    val r2 = VcfStats.ldPairs(df, maxDist = 40, binSize = 16)
      .collect().map(r => (r.getString(1), r.getString(3)) ->
        r.getDouble(6)).toMap
    assert(r2(("A", "B")) == 0.81 && r2(("B", "C")) == 0.81 &&
      r2(("A", "C")) == 0.64, r2.toString)
    val kept = VcfStats.ldPrune(df, maxDist = 40, r2Threshold = 0.7,
      binSize = 16).collect()
      .map(r => r.getString(2) -> r.getBoolean(3)).toMap
    assert(kept == Map("A" -> true, "B" -> false, "C" -> true), kept)
  }

  test("burdenScores: carrier dosage sums per transcript, missing " +
    "calls and non-exonic variants invisible") {
    val s = spark
    import s.implicits._
    val hits = Seq(("v1", "T1"), ("v2", "T1"), ("v3", "T2"))
      .toDF("varId", "transcript_id")
    // v4 is NOT in hits (intronic / AF-capped upstream) and must not
    // contribute; Sa's missing call at v3 drops (T2, Sa) entirely
    val gts = Seq(
      ("v1", "Sa", "1|0"), ("v1", "Sb", "0|0"),
      ("v2", "Sa", "1|1"), ("v2", "Sb", "0|1"),
      ("v3", "Sa", ".|."), ("v3", "Sb", "1|0"),
      ("v4", "Sa", "1|1"), ("v4", "Sb", "1|1"))
      .toDF("varId", "sample", "gt")
    val out = VcfStats.burdenScores(hits, gts).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      ("T1", "Sa") -> ((2L, 3L)),
      ("T1", "Sb") -> ((1L, 1L)),
      ("T2", "Sb") -> ((1L, 1L))))
  }

  test("compoundHet: in-trans hets flag, cis pairs don't, hom-ALT and " +
    "unphased calls count toward neither side") {
    val s = spark
    import s.implicits._
    val hits = Seq(("v1", "T1"), ("v2", "T1"), ("v3", "T1"),
      ("v4", "T2")).toDF("varId", "transcript_id")
    val gts = Seq(
      ("v1", "Sa", "1|0"), ("v2", "Sa", "0|1"), // trans -> comp-het
      ("v1", "Sb", "1|0"), ("v2", "Sb", "1|0"), // cis -> not
      ("v3", "Sc", "1|1"),                      // hom -> neither side
      ("v1", "Sd", "1/0"),                      // unphased -> excluded
      ("v4", "Se", "0|1")                       // single het -> not
    ).toDF("varId", "sample", "gt")
    val out = graft.operators.VcfStats.compoundHet(hits, gts).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out == Map(
      ("T1", "Sa") -> ((1L, 1L, true)),
      ("T1", "Sb") -> ((2L, 0L, false)),
      ("T2", "Se") -> ((0L, 1L, false))))
  }

  test("kingPrune: keep-earliest greedy drops later members, skips " +
    "pairs already covered") {
    val s = spark
    import s.implicits._
    // a/b/c identical (all three pairs phi = 0.5), d strongly negative
    // vs each: walk (a,b) drops b, (a,c) drops c, (b,c) skips (both
    // gone) -> only a of the triplet survives, d untouched
    val gts = Seq(
      ("v1", "a", "0|1"), ("v1", "b", "0|1"), ("v1", "c", "0|1"),
      ("v1", "d", "0|0"),
      ("v2", "a", "0|0"), ("v2", "b", "0|0"), ("v2", "c", "0|0"),
      ("v2", "d", "1|1"),
      ("v3", "a", "1|1"), ("v3", "b", "1|1"), ("v3", "c", "1|1"),
      ("v3", "d", "0|1"))
      .map { case (v, sm, gt) => (v, "1", 10L, sm, gt) }
      .toDF("varId", "chrom", "pos", "sample", "gt")
    val out = VcfStats.kingPrune(gts, cutoff = 0.25).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(out == Map("a" -> false, "b" -> true, "c" -> true,
      "d" -> false))
  }

  test("kingKinship: duplicate samples -> 0.5, opposite homozygotes " +
    "push negative, zero-het pair -> null") {
    val s = spark
    import s.implicits._
    // a and b identical (3 sites incl. 1 het) -> phi = 0.5 exactly;
    // a vs c: 1 both-het, 1 opp-hom, hets (2,1) ->
    //   (2*1 - 4*1 - 2 - 1)/(4*1) + 0.5 = -5/4 + 0.5 = -0.75;
    // a vs d: d has no hets -> kinship null; missing call at v3 for d
    // drops that site from (a,d)'s n_sites
    val gts = Seq(
      ("v1", "a", "0|1"), ("v1", "b", "0|1"), ("v1", "c", "0|1"),
      ("v1", "d", "0|0"),
      ("v2", "a", "0|0"), ("v2", "b", "0|0"), ("v2", "c", "1|1"),
      ("v2", "d", "0|0"),
      ("v3", "a", "0|1"), ("v3", "b", "0|1"), ("v3", "c", "0|0"),
      ("v3", "d", ".|."))
      .map { case (v, sm, gt) => (v, "1", 10L, sm, gt) }
      .toDF("varId", "chrom", "pos", "sample", "gt")
    val out = VcfStats.kingKinship(gts).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("a", "b"))
    assert(ab.getLong(2) == 3 && ab.getDouble(7) == 0.5)
    val ac = out(("a", "c"))
    assert(ac.getLong(3) == 1 && ac.getLong(4) == 1 &&
      ac.getLong(5) == 2 && ac.getLong(6) == 1)
    assert(ac.getDouble(7) == -0.75)
    val ad = out(("a", "d"))
    assert(ad.getLong(2) == 2 && ad.isNullAt(7),
      "zero-het side must yield null kinship over the 2 shared sites")
  }
}
