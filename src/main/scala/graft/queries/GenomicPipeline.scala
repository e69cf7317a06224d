package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.GenomicFixtures
import graft.operators.{HaploProteins, Haplotypes}
import graft.sources.Gtf

/** End-to-end ProHap/ProVar pipelines over the genomic fixtures:
  * VCF genotypes -> per-copy haplotypes -> mutated cDNA -> protein
  * database. These queries are checked by the driver's rows-only gate
  * (the full pipeline is not expressible in one DuckDB SQL statement) and
  * by hand-computed expectations in HaploProteinsSpec.
  */
object GenomicPipeline {

  private val fx = GenomicFixtures.dir
  private def prep(s: SparkSession): Unit = GenomicFixtures.ensure(s)

  /** Per-transcript annotation + cDNA: transcript, chrom, biotype, strand,
    * exons, start_codon_start, stop_codon_start, cdna.
    */
  def transcriptInfo(s: SparkSession): DataFrame = {
    val gtf = Gtf.read(s, GenomicFixtures.gtfPath)
    val t = Gtf.transcriptsByBiotype(gtf, Seq("all"))
      .select(col("transcriptID").as("transcript"),
        col("chromosome").as("chrom"), col("biotype"), col("strand"))
    val exons = Gtf.exonsByTranscript(gtf)
      .withColumnRenamed("transcript_id", "transcript")
    def codonStart(feature: String, out: String) = gtf
      .where(col("feature") === feature)
      .select(Gtf.attr(col("attributes"), "transcript_id").as("transcript"),
        col("start"))
      .groupBy("transcript").agg(min(col("start")).as(out))
    val cdna = s.read.parquet(s"$fx/cdna.parquet")
      .withColumnRenamed("transcript_id", "transcript")
      .withColumnRenamed("sequence", "cdna")
    t.join(exons, Seq("transcript"))
      .join(codonStart("start_codon", "start_codon_start"),
        Seq("transcript"), "left")
      .join(codonStart("stop_codon", "stop_codon_start"),
        Seq("transcript"), "left")
      .join(cdna, Seq("transcript")) // transcripts without cDNA are skipped
  }

  /** Haplotype rows with full variant detail arrays (conflicts dropped),
    * counts and frequencies — get_haplotypes.py output shape, plus the
    * transcript annotation columns proteinDatabase needs.
    */
  def haploInput(s: SparkSession): DataFrame = {
    val gts = s.read.parquet(s"$fx/gts_long.parquet")
    val ph = Haplotypes.phased(gts)
    val universe = ph.select("transcript", "sample", "phase").distinct()
    val copyCounts = universe.groupBy("transcript")
      .agg(count(lit(1)).as("total_copies"))

    val sigs = ph.where(col("has_alt"))
      .groupBy("transcript", "sample", "phase")
      .agg(
        array_sort(collect_list(struct(col("pos"), col("varId"),
          col("ref"), col("alt"), col("allele_af").as("af"))))
          .as("changes"),
        Haplotypes.hasConflict(collect_list(struct(col("pos"),
          length(col("ref")).as("refLen")))).as("conflict"))
      .where(!col("conflict"))
      .withColumn("signature",
        array_join(transform(col("changes"), v => v.getField("varId")), ";"))

    sigs
      .groupBy("transcript", "signature")
      .agg(
        first(col("changes")).as("changes"),
        count(lit(1)).as("hap_count"),
        array_join(
          transform(array_sort(collect_list(struct(col("sample"),
            col("phase")))), s0 => concat(s0.getField("sample"), lit(":"),
            s0.getField("phase").cast("string"))), ";").as("samples"))
      .join(copyCounts, Seq("transcript"))
      .withColumn("frequency",
        round(col("hap_count") / col("total_copies"), 6))
      .drop("total_copies")
      .join(transcriptInfo(s), Seq("transcript"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h4_protein_db" -> ((s, _) => {
      prep(s)
      HaploProteins.proteinDatabase(haploInput(s))
        .orderBy("transcript", "vcf_ids")
    }),

    "h5_protein_dedup" -> ((s, _) => {
      prep(s)
      HaploProteins.dedupProteins(
        HaploProteins.proteinDatabase(haploInput(s)))
    }),

    "pv1_provar" -> ((s, _) => {
      prep(s)
      // ProVar: one row per variant x transcript (no haplotype grouping,
      // UTRs kept, synonymous kept) — process_variants.py semantics
      val gts = s.read.parquet(s"$fx/gts_long.parquet")
      val perVariant = gts
        .select("transcript", "varId", "pos", "ref", "alt", "allele_af")
        .distinct()
        // multi-allelic rows share a VCF id: make the per-allele id unique
        // so rows don't merge (reference emits one row per allele line)
        .withColumn("varId", concat(col("varId"), lit(":"), col("alt")))
        .withColumn("changes", array(struct(col("pos"), col("varId"),
          col("ref"), col("alt"), col("allele_af").as("af"))))
        .withColumn("signature", col("varId"))
        .withColumn("hap_count", lit(1L))
        .withColumn("frequency", lit(0.0))
        .withColumn("samples", lit(""))
        .join(transcriptInfo(s), Seq("transcript"))
      HaploProteins.proteinDatabase(perVariant, ignoreUtr = false,
        skipStartLoss = false, requireNonSyn = false)
        .orderBy("transcript", "vcf_ids")
    })
  )

  /** No SQL oracles: the driver applies its rows-only check; exact-output
    * expectations live in HaploProteinsSpec.
    */
  val oracles: Map[String, String] = Map.empty
}
