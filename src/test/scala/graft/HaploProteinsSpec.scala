package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.fixtures.GenomicFixtures
import graft.operators.HaploProteins
import graft.queries.GenomicPipeline

/** Hand-computed expectations for the ProHap pipeline over the fixture
  * mini-genome (tools/gen_fixtures.py documents the construction).
  * These rows were derived on paper from the reference semantics in
  * process_haplotypes.py / coordinates_toolbox.py.
  */
class HaploProteinsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("haplo-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GenomicFixtures.ensure(spark)
  }

  override def afterAll(): Unit = spark.stop()

  private lazy val db =
    HaploProteins.proteinDatabase(GenomicPipeline.haploInput(spark))
      .collect()
      .map(r => (r.getAs[String]("transcript"), r.getAs[String]("vcf_ids")) ->
        r)
      .toMap

  test("forward-strand SAV translates to the hand-computed protein") {
    val r = db(("T1", "rs1"))
    assert(r.getAs[String]("protein_sequence") == "MGSRL")
    assert(r.getAs[String]("variant_types") == "SAV")
    assert(r.getAs[String]("protein_changes") == "1:A>1:G")
    assert(r.getAs[Int]("reading_frame") == 1)
    // prefix is 0 after UTR trimming (reference sets it post-trim)
    assert(r.getAs[Long]("protein_prefix_length") == 0L)
  }

  test("reverse-strand SAV: alleles reverse-complemented, position flipped") {
    val r = db(("T2", "rs9"))
    assert(r.getAs[String]("protein_sequence") == "MPKGY")
    assert(r.getAs[String]("protein_changes") == "4:F>4:Y")
    assert(r.getAs[Int]("reading_frame") == 2)
    // 3 carrier copies of 6 total (males haploid on X outside PAR)
    assert(r.getAs[Long]("occurrence_count") == 3L)
  }

  test("stop-loss extends the ORF; downstream 3'UTR variant becomes coding") {
    val lost = db(("T1", "rs5"))
    assert(lost.getAs[String]("variant_types") == "stop_lost")
    assert(lost.getAs[String]("protein_sequence")
      .startsWith("MASRLL")) // stop L; ORF runs on
    val withUtr = db(("T1", "rs5;rs2"))
    assert(withUtr.getAs[String]("variant_types") == "stop_lost;SAV")
    assert(withUtr.getAs[String]("protein_sequence").contains("E"))
  }

  test("frameshift insertion: downstream stop destroyed, (+fs) annotated") {
    val r = db(("T1", "rs1;rs4"))
    assert(r.getAs[String]("variant_types") == "SAV;frameshift")
    assert(r.getAs[String]("all_protein_changes").contains("(+fs)"))
    assert(r.getAs[String]("protein_sequence") == "MGSTIMTLEP")
  }

  test("two-SAV haplotype applies both substitutions (S6 copy1: rs1+rs13)") {
    // MASRL with 1:A>G (rs1) and 3:R>G (rs13) -> MGSGL; both changes listed
    val r = db(("T1", "rs1;rs13"))
    assert(r.getAs[String]("protein_sequence") == "MGSGL")
    assert(r.getAs[String]("variant_types") == "SAV;SAV")
    assert(r.getAs[String]("protein_changes") == "1:A>1:G;3:R>3:G")
    assert(r.getAs[Long]("occurrence_count") == 1L)
  }

  test("UTR-only, synonymous and conflicted haplotypes are dropped") {
    // rs3 (5'UTR only), rs2 alone (3'UTR), rs5-A (synonymous TGA->TAA),
    // rs8 (T2 3'UTR), and the conflicted rs1+rs7 copy must not appear
    assert(!db.contains(("T1", "rs3")))
    assert(!db.contains(("T1", "rs2")))
    assert(!db.contains(("T2", "rs8")))
    assert(!db.keys.exists { case (_, ids) => ids.contains("rs7") })
  }

  test("protein dedup groups identical sequences") {
    val dedup = HaploProteins.dedupProteins(
      HaploProteins.proteinDatabase(GenomicPipeline.haploInput(spark)))
      .collect()
    assert(dedup.map(_.getAs[String]("protein_sequence")).distinct.length ==
      dedup.length)
  }

  test("keepCdna: CDS-trimmed mutated cDNA re-translates to the protein") {
    import org.apache.spark.sql.functions._
    import graft.functions.dna
    // ignoreUtr (default): the carried cDNA is the CDS segment, start 0,
    // and translating it from frame 0 must reproduce the stored protein
    // (process_haplotypes.py:368-401 — the segment is exactly the codons
    // of the trimmed protein, stop codon excluded)
    val rows = HaploProteins.proteinDatabase(
      GenomicPipeline.haploInput(spark), keepCdna = true)
      .withColumn("_retr", dna.translateDna(col("cdna_sequence")))
      .collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Int]("reading_frame") > -1).foreach { r =>
      assert(r.getAs[Long]("cdna_start") == 0L, r.getAs[String]("transcript"))
      assert(r.getAs[String]("_retr") == r.getAs[String]("protein_sequence"),
        s"${r.getAs[String]("transcript")}:${r.getAs[String]("vcf_ids")}")
    }
    // unknown frame keeps the full sequence, start -1
    rows.filter(_.getAs[Int]("reading_frame") == -1).foreach { r =>
      assert(r.getAs[Long]("cdna_start") == -1L)
    }
    // UTRs kept: full mutated cDNA, start = rf + protein_start*3, and
    // translating from that rf reproduces the (untrimmed) protein
    val full = HaploProteins.proteinDatabase(
      GenomicPipeline.haploInput(spark), ignoreUtr = false,
      keepCdna = true)
      .where(col("reading_frame") > -1)
      .withColumn("_retr", dna.translateDna(col("cdna_sequence"),
        col("reading_frame")))
      .collect()
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getAs[Long]("cdna_start") ==
        r.getAs[Int]("reading_frame") +
          3 * r.getAs[Long]("protein_prefix_length"),
        s"${r.getAs[String]("transcript")}:${r.getAs[String]("vcf_ids")}")
      assert(r.getAs[String]("_retr") == r.getAs[String]("protein_sequence"))
    }
    // dedupCdna: one row per distinct sequence, members preserved
    val dd = HaploProteins.dedupCdna(HaploProteins.proteinDatabase(
      GenomicPipeline.haploInput(spark), keepCdna = true)).collect()
    assert(dd.map(_.getAs[String]("cdna_sequence")).distinct.length ==
      dd.length)
    assert(dd.map(_.getAs[Long]("n_haplotypes")).sum == rows.length)
    GenomicPipeline.releaseCaches()
  }

  test("ProVar keeps synonymous and UTR variants (one row per allele)") {
    val pv = GenomicPipeline.queries("pv1_provar")(spark, "")
      .collect()
    assert(pv.length == 12) // 9 T1 + 2 T2 + 1 T5 alleles; T4 has no cDNA
    val ids = pv.map(_.getAs[String]("vcf_ids"))
    assert(ids.count(_.startsWith("rs5")) == 2) // both alleles kept
    // rs13 (chr1:24 C>G) lands at cDNA 13 (0-based), CDS codon 4 CGA>GGA:
    // missense R>G at protein index 3 of MASRL (process_variants.py semantics)
    val r13 = pv.find(_.getAs[String]("vcf_ids") == "rs13:G").get
    assert(r13.getAs[String]("cdna_changes") == "13:C>G")
    assert(r13.getAs[String]("all_protein_changes") == "3:R>3:G")
    assert(r13.getAs[String]("variant_types") == "SAV")
  }

  test("junction-crossing allele is reassembled across the intron") {
    // rs12 REF spans exon1[39..40] + intron[41..60] + exon2[61..62];
    // coordinates_toolbox.py splices the tail back on: spliced REF = AACC
    // at cDNA 28, ALT = TT (frameshift), junction 1 affected
    val pv = GenomicPipeline.queries("pv1_provar")(spark, "")
      .collect().map(r => r.getAs[String]("vcf_ids") -> r).toMap
    val r = pv("rs12:TT")
    assert(r.getAs[String]("cdna_changes") == "28:AACC>TT")
    assert(r.getAs[String]("variant_types") == "splice_variant")
    assert(r.getAs[String]("splice_sites_affected") == "1")
    assert(r.getAs[String]("all_protein_changes") == "8:NL>8:F(+fs)")
  }

  test("unknown reading frame: three-frame consequence chaining") {
    // T5 has no start or stop codon -> rf = -1; the SNP rs11 (cDNA 9 T>G)
    // is stop_lost in frame 0 (TAA>GAA), synonymous in frame 1 (GTT>GTG),
    // stop_gained in frame 2 (TTA>TGA) — all three '|'-chained
    val r = db(("T5", "rs11"))
    assert(r.getAs[Int]("reading_frame") == -1)
    assert(r.getAs[String]("variant_types") ==
      "stop_lost|synonymous|stop_gained")
    assert(r.getAs[String]("all_protein_changes") ==
      "3:*>3:E|2:V>2:V|2:L>2:*")
    assert(r.getAs[String]("protein_sequence") == "PYGEPVNRLT") // frame 0
    assert(r.getAs[String]("alt_frame_sequences") ==
      "RTVNRLTG*;VR*TG*PVN") // frames 1 and 2
  }

  test("vcf-id merge sums population frequencies (add_population_freqs)") {
    // S1 copy1 carries rs1; S5 copy1 carries rs1+rs12 — after the UTR
    // filter drops rs12 both collapse to vcf_ids=rs1: counts and per-pop
    // frequencies add (GBR: S1 1/4 copies; FIN: S5 1/4 copies)
    val r = db(("T1", "rs1"))
    assert(r.getAs[Long]("occurrence_count") == 2L)
    assert(r.getAs[String]("frequency_population") ==
      "FIN:0.25000;GBR:0.25000")
    assert(r.getAs[String]("frequency_superpopulation") == "EUR:0.25000")
    assert(r.getAs[String]("samples") == "S1:1;S5:1")
  }

  test("rf=-1 haplotypes contribute one dedup entry per frame") {
    val dedup = HaploProteins.dedupProteins(
      HaploProteins.proteinDatabase(GenomicPipeline.haploInput(spark)))
      .collect().map(r => r.getAs[String]("protein_sequence") -> r).toMap
    assert(dedup("RTVNRLTG*").getAs[String]("rfs") == "1")
    assert(dedup("VR*TG*PVN").getAs[String]("rfs") == "2")
    assert(dedup("PYGEPVNRLT").getAs[String]("rfs") == "0")
  }

  // inline single-haplotype input for edge cases the shared fixture
  // doesn't reach
  private def inlineHaplo(exons: Seq[(Long, Long)], startCodon: Option[Long],
                          cdna: String,
                          changes: Seq[(Long, String, String, String)]) = {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    Seq(1).toDF("x").select(
      lit("TX").as("transcript"), lit("1").as("chrom"),
      lit("protein_coding").as("biotype"), lit("+").as("strand"),
      array(exons.map { case (s, e) =>
        struct(lit(s).as("start"), lit(e).as("end")) }: _*).as("exons"),
      startCodon.map(lit(_)).getOrElse(lit(null)).cast("long")
        .as("start_codon_start"),
      lit(null).cast("long").as("stop_codon_start"),
      lit(cdna).as("cdna"),
      lit(changes.map(_._2).mkString(";")).as("signature"),
      array(changes.map { case (pos, id, ref, alt) =>
        struct(lit(pos).as("pos"), lit(id).as("varId"), lit(ref).as("ref"),
          lit(alt).as("alt"), lit(0.5).as("af")) }: _*).as("changes"),
      lit(1L).as("hap_count"), lit(0.5).as("frequency"),
      lit("S1:1").as("samples"))
  }

  test("allele ending exactly AT the exon end gets the splice flag") {
    // coordinates_toolbox.py: 'dna_location + ref_len > exon.end' fires
    // for an allele whose last base IS the exon end (39+2 > 40) — the
    // splice flag is set even though nothing is truncated
    val cdna = "ATG" + "GCT" * 19 // 60 nt, no stops, M + 19xA
    val r = HaploProteins.proteinDatabase(inlineHaplo(
      Seq((11L, 40L), (61L, 90L)), Some(11L), cdna,
      Seq((39L, "rsEdge", "CT", "AT")))).collect()
    assert(r.length == 1)
    assert(r(0).getAs[String]("variant_types") == "splice_variant")
    assert(r(0).getAs[String]("splice_sites_affected") == "1")
    assert(r(0).getAs[String]("protein_changes") == "9:A>9:D")
    assert(r(0).getAs[String]("protein_sequence") ==
      "M" + "A" * 8 + "D" + "A" * 10)
  }

  test("rf=-1: a frameshift visible in ANY frame chains _after_fs") {
    // process_haplotypes.py:353 ORs 'fs and loc_ref >= 0' over every
    // frame: the insertion at rna 1 has ploc -1 in frame 2 but 0 in
    // frames 0/1, so the downstream SNP must still carry (fs)/_after_fs
    val cdna = "ATG" + "GCT" * 19
    val r = HaploProteins.proteinDatabase(inlineHaplo(
      Seq((11L, 70L)), None, cdna,
      Seq((12L, "fs1", "T", "TT"), (21L, "snp2", "C", "A")))).collect()
    assert(r.length == 1)
    val types = r(0).getAs[String]("variant_types").split(";")
    assert(types(1).split("\\|").forall(_.endsWith("_after_fs")),
      s"expected _after_fs on every frame of the downstream SNP: ${types(1)}")
    assert(r(0).getAs[String]("all_protein_changes").contains("(fs)"))
  }
}
