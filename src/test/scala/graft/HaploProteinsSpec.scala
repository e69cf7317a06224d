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

  test("ProVar keeps synonymous and UTR variants (one row per allele)") {
    val pv = GenomicPipeline.queries("pv1_provar")(spark, "")
      .collect()
    assert(pv.length == 9) // 7 T1 + 2 T2 alleles; T4 has no cDNA
    val ids = pv.map(_.getAs[String]("vcf_ids"))
    assert(ids.count(_.startsWith("rs5")) == 2) // both alleles kept
  }
}
