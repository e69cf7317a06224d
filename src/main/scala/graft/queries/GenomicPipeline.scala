package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.GenomicFixtures
import graft.operators.{HaploProteins, Haplotypes, PeptideAnnotate,
  PeptideVariants}
import graft.sources.Gtf

/** End-to-end ProHap/ProVar pipelines over the genomic fixtures:
  * VCF genotypes -> per-copy haplotypes -> mutated cDNA -> protein
  * database. The full pipeline is not expressible in one DuckDB SQL
  * statement, so h4/h5/pv1 are hash-checked against committed
  * expected-output snapshots (fixtures/expected/) that HaploProteinsSpec
  * independently asserts field-by-field from hand-computed reference
  * semantics; p2 has a real SQL oracle.
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

    // one heavy shuffle of the genotype matrix: per-copy variant lists.
    // Both the haplotype grouping and the population rollup derive from
    // this shared table (it previously ran twice — once here, once inside
    // populationFrequencies). Persisted because two branches consume it;
    // it is per-copy pre-aggregated, i.e. far smaller than the matrix.
    val sigDetail = ph.where(col("has_alt"))
      .groupBy("transcript", "sample", "phase")
      .agg(
        array_sort(collect_list(struct(col("pos"), col("varId"),
          col("ref"), col("alt"), col("allele_af").as("af"))))
          .as("changes"),
        Haplotypes.hasConflict(collect_list(struct(col("pos"),
          length(col("ref")).as("refLen")))).as("conflict"))
    val perCopy = universe.join(sigDetail,
        Seq("transcript", "sample", "phase"), "left")
      .withColumn("conflict", coalesce(col("conflict"), lit(false)))
      .withColumn("signature", when(col("changes").isNull, lit("REF"))
        .otherwise(array_join(transform(col("changes"),
          v => v.getField("varId")), ";")))
      .persist()
    pendingCaches.add(perCopy)

    val haplos = perCopy
      .where(col("changes").isNotNull && !col("conflict"))
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

    // population + superpopulation frequency strings "POP:0.00123;..."
    // (get_haplotypes.count_freq_pop format, 5 decimals, codes sorted) in
    // ONE rollup: the metadata is stacked with a level prefix so per-level
    // counts and denominators come out of a single shuffle. Conflicted and
    // REF copies stay in the denominators/rollup exactly like
    // populationFrequencies (h2/h2b semantics).
    val meta = s.read.parquet(s"$fx/samples_meta.parquet")
    val stacked = meta.select(col("sample"),
      concat(lit("p|"), col("population")).as("population"))
      .unionByName(meta.select(col("sample"),
        concat(lit("s|"), col("superpopulation")).as("population")))
    val popCopies = universe.join(stacked, Seq("sample"))
      .groupBy("transcript", "population")
      .agg(count(lit(1)).as("pop_copies"))
    def strOf(lvl: String) = array_join(array_sort(collect_list(
      when(substring_index(col("population"), "|", 1) === lvl,
        concat(substring_index(col("population"), "|", -1), lit(":"),
          format_string("%.5f", col("pop_frequency")))))), ";")
    val popStrings = perCopy.join(stacked, Seq("sample"))
      .groupBy("transcript", "signature", "population")
      .agg(count(lit(1)).as("pop_count"))
      .join(popCopies, Seq("transcript", "population"))
      .withColumn("pop_frequency",
        round(col("pop_count") / col("pop_copies"), 6))
      .groupBy("transcript", "signature")
      .agg(strOf("p").as("freq_population"),
        strOf("s").as("freq_superpopulation"))

    haplos
      .join(popStrings, Seq("transcript", "signature"), "left")
      .na.fill("-", Seq("freq_population", "freq_superpopulation"))
      .join(transcriptInfo(s), Seq("transcript"))
  }

  private var dbReady = false

  /** Frames persisted by haploInput; drained (unpersisted) once a
    * consumer has materialized — long-lived sessions would otherwise
    * accumulate dead cached blocks per haploInput call.
    */
  private val pendingCaches =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every frame haploInput persisted. Callers that run
    * haploInput-derived plans directly (not via proteinDb) should call
    * this after their action.
    */
  def releaseCaches(): Unit = {
    var df = pendingCaches.poll()
    while (df != null) {
      df.unpersist(blocking = false); df = pendingCaches.poll()
    }
  }

  /** The protein database is consumed by h4/h5/p2 — materialize it once
    * per JVM instead of re-running the pipeline per query.
    */
  def proteinDb(s: SparkSession): DataFrame = synchronized {
    val path = s"$fx/protein_db.parquet"
    if (!dbReady) {
      HaploProteins.proteinDatabase(haploInput(s))
        .write.mode("overwrite").parquet(path)
      dbReady = true
      releaseCaches() // the parquet is the product; drop the lineage cache
    }
    s.read.parquet(path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "h4_protein_db" -> ((s, _) => {
      prep(s)
      proteinDb(s).orderBy("transcript", "vcf_ids")
    }),

    "h5_protein_dedup" -> ((s, _) => {
      prep(s)
      HaploProteins.dedupProteins(proteinDb(s))
    }),

    "p2_pep_annotate" -> ((s, _) => {
      prep(s)
      // combined search space: haplotype proteins (with variant metadata;
      // rf=-1 haplotypes contribute one entry per frame like the
      // reference's FASTA, process_haplotypes.py:456-470) + contaminant /
      // manual fixture entries (tags normalized like merge_duplicate_seq
      // .py:64-66: sp counts as cont) + the ENST-promoted reference
      // proteome entries (fix_headers.py use_ENST)
      val base = proteinDb(s).withColumn("_hap", concat(lit("haplo_"),
        col("transcript"), lit("_"), substring(md5(col("vcf_ids")), 1, 8)))
      val entries = when(col("alt_frame_sequences") === "-",
        array(struct(col("_hap").as("accession"),
          col("reading_frame").as("frame_idx"),
          col("protein_sequence").as("sequence"))))
        .otherwise(array(
          struct(concat(col("_hap"), lit("_f0")).as("accession"),
            lit(0).as("frame_idx"), col("protein_sequence").as("sequence")),
          struct(concat(col("_hap"), lit("_f1")).as("accession"),
            lit(1).as("frame_idx"),
            split(col("alt_frame_sequences"), ";").getItem(0)
              .as("sequence")),
          struct(concat(col("_hap"), lit("_f2")).as("accession"),
            lit(2).as("frame_idx"),
            split(col("alt_frame_sequences"), ";").getItem(1)
              .as("sequence"))))
      val db = base.select(explode(entries).as("e"),
        col("transcript"), col("chromosome"), col("all_protein_changes"),
        col("dna_changes"), col("protein_prefix_length"))
        .select(col("e.accession").as("accession"),
          lit("generic_enshap").as("tag"),
          col("transcript"), col("chromosome"),
          col("all_protein_changes"), col("dna_changes"),
          col("protein_prefix_length"),
          col("e.frame_idx").cast("int").as("frame_idx"),
          col("e.sequence").as("sequence"))
      val fixture = s.read.parquet(s"$fx/proteins.parquet")
        .select(col("accession"),
          when(col("tag") === "generic_sp", "generic_cont")
            .otherwise(col("tag")).as("tag"),
          lit(null).cast("string").as("transcript"),
          lit(null).cast("string").as("chromosome"),
          lit(null).cast("string").as("all_protein_changes"),
          lit(null).cast("string").as("dna_changes"),
          lit(0L).as("protein_prefix_length"),
          lit(null).cast("int").as("frame_idx"),
          col("sequence"))
      // ENST-keyed canonical entries (read_fasta keys by stable id, so a
      // duplicate promoted accession keeps one entry)
      val ensref = s.read.parquet(s"$fx/ensref.parquet")
        .select(regexp_extract(col("description"),
          "transcript:([A-Za-z0-9]+)", 1).as("accession"), col("sequence"))
        .where(col("accession") =!= "")
        .groupBy("accession").agg(max(col("sequence")).as("sequence"))
        .select(col("accession"), lit("generic_ensref").as("tag"),
          col("accession").as("transcript"),
          lit(null).cast("string").as("chromosome"),
          lit(null).cast("string").as("all_protein_changes"),
          lit(null).cast("string").as("dna_changes"),
          lit(0L).as("protein_prefix_length"),
          lit(null).cast("int").as("frame_idx"),
          col("sequence"))
      val proteins = db.unionByName(fixture).unionByName(ensref)
      // transcript -> gene annotation lookup (fixture GTF + Ensembl-style)
      val geneMap = Gtf.read(s, GenomicFixtures.gtfPath)
        .where(col("feature") === "transcript")
        .select(Gtf.attr(col("attributes"), "transcript_id")
          .as("transcript"),
          Gtf.attr(col("attributes"), "gene_id").as("gene"))
        .unionByName(s.read.parquet(s"$fx/ensref_tr.parquet")
          .select(col("transcript_id").as("transcript"),
            col("gene_id").as("gene")))
      // dump the combined tables for the DuckDB oracle
      proteins.write.mode("overwrite")
        .parquet(s"$fx/pep_proteins.parquet")
      geneMap.write.mode("overwrite").parquet(s"$fx/pep_genes.parquet")
      val matches = PeptideAnnotate.matchPeptides(
        s.read.parquet(s"$fx/peptides.parquet"), proteins, k = 4)
        .withColumn("pos", col("pos").cast("long"))
      PeptideVariants.annotate(matches, proteins.drop("sequence"),
        geneMap, s.read.parquet(s"$fx/refprot.parquet"))
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

  /** p2 has a full SQL oracle over the dumped combined protein table.
    * h4/h5/pv1 (the end-to-end pipeline, not expressible as one SQL
    * statement) are hash-checked against committed expected-output
    * snapshots (fixtures/expected/, regenerated by graft.tools.Snapshot)
    * whose rows are independently asserted field-by-field against
    * hand-computed reference semantics in HaploProteinsSpec.
    */
  val oracles: Map[String, String] = {
    def pq(name: String) = s"read_parquet('$fx/$name.parquet/*.parquet')"
    def snapshot(name: String) =
      s"SELECT * FROM read_parquet('/root/repo/fixtures/expected/$name.parquet')"
    // shared SQL fragments for parsing "locRef:REF>locAlt:ALT[(+fs)]"
    def locAlt(ch: String) =
      s"TRY_CAST(regexp_extract($ch, '>(-?[0-9]+):', 1) AS BIGINT)"
    def cleanRef(ch: String) =
      s"replace(translate(regexp_extract($ch, '^-?[0-9]+:([^>]*)>', 1), " +
        s"'I', 'L'), '-', '')"
    def cleanAlt(ch: String) =
      s"replace(translate(string_split(regexp_extract($ch, " +
        s"'>-?[0-9]+:(.*)$$', 1), '(')[1], 'I', 'L'), '-', '')"
    def fs(ch: String) = s"ends_with($ch, '(+fs)')"

    Map(
      "h4_protein_db" -> snapshot("h4_protein_db"),
      "h5_protein_dedup" -> snapshot("h5_protein_dedup"),
      "pv1_provar" -> snapshot("pv1_provar"),
      "p2_pep_annotate" ->
        s"""WITH m AS (
           |  SELECT p.pepId, p.peptide, pr.accession, o.mpos AS pos
           |  FROM ${pq("peptides")} p, ${pq("pep_proteins")} pr,
           |    LATERAL (SELECT unnest([ii for ii in generate_series(1,
           |      length(pr.sequence) - length(p.peptide) + 1)
           |      if substr(pr.sequence, ii, length(p.peptide)) = p.peptide])
           |      AS mpos) o
           |  WHERE length(p.peptide) >= 4),
           |j AS (
           |  SELECT m.*, pr.tag, pr.transcript, pr.chromosome,
           |    pr.all_protein_changes, pr.dna_changes,
           |    pr.protein_prefix_length,
           |    m.pos - 1 - coalesce(pr.protein_prefix_length, 0)
           |      AS pepStart,
           |    m.pos - 1 - coalesce(pr.protein_prefix_length, 0)
           |      + length(m.peptide) AS pepEnd,
           |    CASE WHEN pr.all_protein_changes IS NULL
           |        OR pr.all_protein_changes = '' THEN []
           |      ELSE string_split(pr.all_protein_changes, ';') END AS chs,
           |    CASE WHEN pr.dna_changes IS NULL OR pr.dna_changes = ''
           |      THEN [] ELSE string_split(pr.dna_changes, ';') END AS dnas
           |  FROM m JOIN ${pq("pep_proteins")} pr USING (accession)),
           |per AS (
           |  SELECT pepId, peptide, accession, pos, tag, transcript,
           |    chromosome, pepStart,
           |    coalesce(list_sum(list_transform(chs, ch ->
           |      CASE WHEN ${locAlt("ch")} < pepStart THEN
           |        length(${cleanAlt("ch")}) - length(${cleanRef("ch")})
           |      ELSE 0 END)), 0) AS preceding_indels,
           |    coalesce(len(list_filter(chs, ch ->
           |      ${locAlt("ch")} < pepStart AND ${fs("ch")})) > 0, false)
           |      AS fs_before,
           |    list_filter(list_zip(chs, dnas), z ->
           |      (${cleanRef("z[1]")} != ${cleanAlt("z[1]")}
           |        OR ${fs("z[1]")})
           |      AND ${locAlt("z[1]")} >= pepStart
           |      AND ${locAlt("z[1]")} < pepEnd
           |      AND translate(substr(peptide,
           |          CAST(${locAlt("z[1]")} - pepStart AS INT) + 1,
           |          length(${cleanAlt("z[1]")})), 'I', 'L')
           |        = substr(${cleanAlt("z[1]")}, 1,
           |            length(translate(substr(peptide,
           |              CAST(${locAlt("z[1]")} - pepStart AS INT) + 1,
           |              length(${cleanAlt("z[1]")})), 'I', 'L'))))
           |      AS covered
           |  FROM j),
           |strs AS (
           |  SELECT *,
           |    CASE WHEN len(covered) > 0 THEN array_to_string(
           |      list_transform(covered, z ->
           |        CAST(${locAlt("z[1]")} - pepStart AS VARCHAR) || ':' ||
           |        ${cleanRef("z[1]")} || '>' || ${cleanAlt("z[1]")}), ';')
           |    END AS cov_pep,
           |    CASE WHEN len(covered) > 0 THEN array_to_string(
           |      list_transform(covered, z -> transcript || ':' || z[1]),
           |      ';') END AS cov_prot,
           |    CASE WHEN len(covered) > 0 THEN array_to_string(
           |      list_transform(covered, z ->
           |        coalesce(chromosome, '?') || ':' || z[2]), ';')
           |    END AS cov_dna,
           |    (len(list_filter(covered, z -> ${fs("z[1]")})) > 0
           |      OR fs_before) AS has_fs
           |  FROM per)
           |SELECT pepId, peptide,
           |  coalesce(string_agg(DISTINCT cov_pep, '|' ORDER BY cov_pep),
           |    '') AS covered_changes_peptide,
           |  coalesce(string_agg(DISTINCT cov_prot, '|' ORDER BY cov_prot),
           |    '') AS covered_changes_protein,
           |  coalesce(string_agg(DISTINCT cov_dna, '|' ORDER BY cov_dna),
           |    '') AS covered_alleles_dna,
           |  string_agg(accession, ';' ORDER BY accession)
           |    AS matching_proteins,
           |  string_agg(DISTINCT coalesce(transcript, '-'), ';'
           |    ORDER BY coalesce(transcript, '-')) AS matching_transcripts,
           |  string_agg(CAST(pos AS VARCHAR), ';' ORDER BY accession, pos)
           |    AS positions_in_proteins,
           |  string_agg(DISTINCT CAST(preceding_indels AS VARCHAR), ';'
           |    ORDER BY CAST(preceding_indels AS VARCHAR))
           |    AS preceding_indel_shift,
           |  bool_or(has_fs) AS has_frameshift,
           |  CASE WHEN max(CASE WHEN contains(coalesce(tag, ''), 'cont')
           |      THEN 1 ELSE 0 END) = 1 THEN 'contaminant'
           |    WHEN max(CASE WHEN contains(coalesce(tag, ''), 'sp')
           |      OR contains(coalesce(tag, ''), 'ensref')
           |      THEN 1 ELSE 0 END) = 1 THEN 'canonical'
           |    WHEN max(CASE WHEN len(covered) > 0 THEN 1 ELSE 0 END) = 1
           |      THEN 'variant'
           |    ELSE 'reference-like' END AS pep_type
           |FROM strs GROUP BY pepId, peptide""".stripMargin
    )
  }
}
