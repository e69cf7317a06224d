package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peptide variant-coverage annotation.
  *
  * Reference: /root/reference/peptide_annotation/src/
  * peptides_annotate_variation.py — for every identified peptide, map its
  * position back into each matching protein, walk the protein's variant
  * list, and report which variants the peptide COVERS (the alternative
  * allele is inside the peptide span and its sequence matches), accounting
  * for the shift introduced by preceding indels and flagging frameshift
  * context. The peptide is then classified:
  *
  *  - contaminant          any matching entry is a contaminant (line 200)
  *  - canonical            any matching entry is a reference protein; only
  *                         ENST-accessioned matches are reported (235-261)
  *  - single-variant(ProVar) a match has no metadata (manual entry, 281)
  *  - multi-variant        >=2 co-occurring covered changes whose reversal
  *                         yields a canonical peptide (455)
  *  - single-variant       a covered alt allele + canonical alternative (457)
  *  - variant-no-ref       covered alt allele, no canonical alternative (459)
  *  - frameshift           a frameshift in or before the peptide (461)
  *  - canonical-no-ref     none of the above (464)
  *
  * plus a specificity class pep_type2: proteoform-specific (one matching
  * protein), protein-specific (one matching gene) or multi-gene (446-451).
  *
  * Reference-allele coverage (check_ref_alleles, lines 145-169): a
  * per-transcript table of non-synonymous allele locations is aggregated
  * from the variant metadata of all haplotypes (rf=-1 rows skipped, lines
  * 93-131); peptides spanning such a location where the REFERENCE amino
  * acid matches report the covered reference allele ("chrom:pos:REF" — no
  * '>' marks it as a ref-allele observation).
  *
  * Canonical-alternative check (check_canonical_peptide, lines 172-190):
  * covered changes are reverted inside the peptide (applied in descending
  * position order, which is equivalent to the reference's ascending walk
  * with a cumulative length shift) and the reverted peptide is searched in
  * the reference proteome of the parent transcript.
  *
  * Multi-frame haplotypes: entries born from rf=-1 haplotypes carry a
  * `frame_idx` and their '|'-chained per-frame change lists are resolved to
  * that frame (lines 368-370).
  *
  * Spark-first: matches explode against per-row change arrays, coverage
  * verification is a per-row expression, the allele-location table is one
  * groupBy over the protein metadata, and the per-peptide rollup is one
  * groupBy with order-stable first-occurrence dedup. Equates I/L like the
  * reference (mass-indistinguishable residues).
  *
  * Documented divergences: duplicate allele locations keep the
  * lexicographically-smallest DNA string (the reference keeps dict
  * insertion order); same-position covered changes revert in
  * deterministic (position, allele) order (the reference keeps list
  * order); peptides with no match at all are omitted (the reference's
  * input report always names at least one protein per peptide).
  */
object PeptideVariants {

  private def il(c: Column): Column = translate(c, "I", "L")

  /** Parse one "locRef:REF>locAlt:ALT[(+fs)]" change string. */
  private def parseChange(ch: Column): Column = struct(
    split(ch, ":").getItem(0).cast("long").as("locRef"),
    regexp_extract(ch, "^-?[0-9]+:([^>]*)>", 1).as("refA"),
    split(regexp_extract(ch, ">-?[0-9]+:(.*)$", 1), "\\(").getItem(0)
      .as("altA"),
    regexp_extract(ch, ">(-?[0-9]+):", 1).cast("long").as("locAlt"),
    ch.endsWith("(+fs)").as("fs"))

  /** ';'-join of first-occurrence-deduplicated values ordered by match
    * rank (the reference's `if x not in list: list.append(x)` /
    * dict.fromkeys idiom over accession-sorted matches).
    */
  private def stableDedupJoin(rank: Column, v: Column, sep: String): Column =
    array_join(
      aggregate(
        array_sort(collect_list(when(v.isNotNull,
          struct(rank.as("r"), v.as("v"))))),
        array().cast("array<string>"),
        (acc, e) => when(array_contains(acc, e.getField("v")), acc)
          .otherwise(concat(acc, array(e.getField("v"))))),
      sep)

  /** ';'-join of values in match-rank order (duplicates kept). */
  private def orderedJoin(rank: Column, v: Column, sep: String): Column =
    array_join(
      transform(
        array_sort(collect_list(when(v.isNotNull,
          struct(rank.as("r"), v.as("v"))))),
        e => e.getField("v")),
      sep)

  /** Annotate peptide->protein matches with covered variants and classify.
    *
    * `matches`: pepId, peptide, accession, pos (1-based within the stored
    *   protein sequence, e.g. from PeptideAnnotate.matchPeptides).
    * `proteins`: accession, tag, transcript, chromosome,
    *   all_protein_changes (';'-joined, '|'-chained per frame for rf=-1
    *   rows, may be empty/null), dna_changes, protein_prefix_length,
    *   frame_idx (int; the reading frame stored with the entry, null when
    *   unknown). Entries with a null transcript and a non-contaminant,
    *   non-reference tag are treated as manually added sequences.
    * `geneMap`: transcript, gene — the annotation lookup (ENST -> ENSG).
    * `refProteins`: transcript, ref_sequence — the reference proteome
    *   keyed by transcript (fix_headers use_ENST output shape).
    */
  def annotate(matches: DataFrame, proteins: DataFrame, geneMap: DataFrame,
               refProteins: DataFrame): DataFrame = {

    // --- transcript_allele_locations (lines 62-131): non-synonymous
    // allele locations per transcript from the haplotype metadata.
    val alleleTable = proteins
      .where(col("transcript").isNotNull &&
        col("all_protein_changes").isNotNull &&
        col("all_protein_changes") =!= "" &&
        !col("all_protein_changes").contains("|"))
      .select(col("transcript"), col("chromosome"),
        explode(zip_with(split(col("all_protein_changes"), ";"),
          split(col("dna_changes"), ";"),
          (c, d) => struct(c.as("ch"), d.as("dna")))).as("z"))
      .select(col("transcript"),
        split(col("z.ch"), ":").getItem(0).cast("long").as("apos"),
        regexp_extract(col("z.ch"), "^-?[0-9]+:([^>]*)>", 1).as("aref"),
        split(regexp_extract(col("z.ch"), ">-?[0-9]+:(.*)$", 1), "\\(")
          .getItem(0).as("aalt"),
        concat(col("chromosome"), lit(":"),
          split(col("z.dna"), ">").getItem(0)).as("adna"))
      .where(col("apos") >= 0 && col("aref") =!= col("aalt"))
      .groupBy("transcript", "apos", "aref")
      .agg(min(col("adna")).as("adna"))
      .groupBy("transcript")
      .agg(array_sort(collect_list(struct(col("apos"), col("aref"),
        col("adna")))).as("ref_alleles"))

    val joined = matches
      .join(proteins, Seq("accession"), "left")
      .join(geneMap.select(col("transcript"), col("gene")),
        Seq("transcript"), "left")
      .join(refProteins.select(col("transcript"), col("ref_sequence")),
        Seq("transcript"), "left")
      .join(alleleTable, Seq("transcript"), "left")

    // 0-based peptide span within the complete protein (start-codon offset
    // removed — peptides_annotate_variation.py:302,359)
    val pepStart = col("pos") - 1 - coalesce(col("protein_prefix_length"),
      lit(0L))
    val pepEnd = pepStart + length(col("peptide"))

    // resolve '|'-chained per-frame changes to this entry's frame (369-370)
    val changes = when(
      col("all_protein_changes").isNull || col("all_protein_changes") === "",
      array().cast("array<string>"))
      .otherwise(when(col("all_protein_changes").contains("|"),
        transform(split(col("all_protein_changes"), ";"),
          ch => element_at(split(ch, "\\|"), col("frame_idx") + 1)))
        .otherwise(split(col("all_protein_changes"), ";")))
    val dnaChanges = when(
      col("dna_changes").isNull || col("dna_changes") === "",
      array().cast("array<string>"))
      .otherwise(split(col("dna_changes"), ";"))

    val parsed = zip_with(changes, dnaChanges, (c, d) => {
      val p = parseChange(c)
      struct(p.as("p"), c.as("raw"), d.as("dna"))
    })

    val isManual = col("transcript").isNull &&
      !coalesce(col("tag"), lit("")).contains("cont") &&
      !coalesce(col("tag"), lit("")).contains("ref")

    val perMatch = joined
      .withColumn("_rank", row_number().over(
        Window.partitionBy("pepId").orderBy("accession", "pos")))
      // stable-accession promotion: ENSTxx_suffix -> ENSTxx (219-220)
      .withColumn("_acc", when(col("accession").startsWith("ENST"),
        substring_index(col("accession"), "_", 1)).otherwise(col("accession")))
      .withColumn("_isEnst", col("_acc").startsWith("ENST"))
      .withColumn("_manual", isManual)
      .withColumn("_pepStart", pepStart)
      .withColumn("_pepEnd", pepEnd)
      .withColumn("_changes", parsed)
      // shift due to indels strictly before the peptide (377-379)
      .withColumn("_preceding", coalesce(aggregate(col("_changes"),
        lit(0L), (acc, c) => {
          val p = c.getField("p")
          val cleanRef = regexp_replace(p.getField("refA"), "-", "")
          val cleanAlt = regexp_replace(p.getField("altA"), "-", "")
          acc + when(p.getField("locAlt") < col("_pepStart"),
            length(cleanAlt) - length(cleanRef)).otherwise(0L)
        }), lit(0L)))
      .withColumn("_fsBefore", coalesce(exists(col("_changes"), c =>
        c.getField("p").getField("locAlt") < col("_pepStart") &&
          c.getField("p").getField("fs")), lit(false)))
      // covered changes: non-synonymous (or fs) within the peptide span
      // whose ALT allele sequence is found at the expected offset (382-398)
      .withColumn("_covered", filter(col("_changes"), c => {
        val p = c.getField("p")
        val cleanRef = il(regexp_replace(p.getField("refA"), "-", ""))
        val cleanAlt = il(regexp_replace(p.getField("altA"), "-", ""))
        val loc = p.getField("locAlt")
        val inPep = loc >= col("_pepStart") && loc < col("_pepEnd")
        val pepRel = (loc - col("_pepStart")).cast("int")
        val found = il(col("peptide").substr(pepRel + 1, length(cleanAlt)))
        val trimmedAlt = cleanAlt.substr(lit(1), length(found))
        (cleanRef =!= cleanAlt || p.getField("fs")) && inPep &&
          found === trimmedAlt
      }))
      // covered REFERENCE alleles of known variant locations (145-169);
      // haplotype matches probe at pepStart - preceding_indels (413)
      .withColumn("_refBase", col("_pepStart") - col("_preceding"))
      .withColumn("_refCovered", coalesce(filter(col("ref_alleles"), a => {
        val pepPos = (a.getField("apos") - col("_refBase")).cast("int")
        val inPep = a.getField("apos") >= col("_refBase") &&
          a.getField("apos") < col("_refBase") + length(col("peptide"))
        val trimmed = il(a.getField("aref")).substr(lit(1),
          (length(col("peptide")) - pepPos).cast("int"))
        val found = il(col("peptide")).substr(pepPos + 1, length(trimmed))
        inPep && found === trimmed
      }), array().cast(
        "array<struct<apos:bigint,aref:string,adna:string>>")))
      // canonical-alternative: revert covered changes (desc position) and
      // search the reference proteome of the parent transcript (172-190)
      .withColumn("_reverted", aggregate(
        reverse(array_sort(transform(col("_covered"), c => {
          val p = c.getField("p")
          struct((p.getField("locAlt") - col("_pepStart")).cast("int")
            .as("loc"),
            il(regexp_replace(p.getField("refA"), "-", "")).as("r"),
            il(regexp_replace(p.getField("altA"), "-", "")).as("a"))
        }))),
        il(col("peptide")),
        (acc, ch) => concat(
          acc.substr(lit(1), ch.getField("loc")),
          ch.getField("r"),
          acc.substr(ch.getField("loc") + length(ch.getField("a")) + 1,
            length(acc)))))
      .withColumn("_canonAlt", when(col("transcript").isNotNull,
        coalesce(il(col("ref_sequence")).contains(col("_reverted")),
          lit(false))))

    val matchStrings = perMatch
      // local change strings; two variants on one codon dedup (420-421)
      .withColumn("_covPep", when(size(col("_covered")) > 0,
        array_join(array_distinct(transform(col("_covered"), c => {
          val p = c.getField("p")
          concat((p.getField("locAlt") - col("_pepStart")).cast("string"),
            lit(":"), il(regexp_replace(p.getField("refA"), "-", "")),
            lit(">"), il(regexp_replace(p.getField("altA"), "-", "")))
        })), ";")))
      .withColumn("_covProt",
        when(col("_manual"), col("_acc"))
          .when(col("transcript").isNotNull,
            when(size(col("_covered")) > 0,
              concat(col("transcript"), lit(":"),
                array_join(array_distinct(transform(col("_covered"),
                  c => c.getField("raw"))), ";")))
              .otherwise(lit(""))))
      // alt + ref DNA alleles sorted by genomic position (344,414)
      .withColumn("_covDna",
        when(col("_manual"), lit("unknown"))
          .when(col("transcript").isNotNull, array_join(transform(
            array_sort(concat(
              transform(col("_covered"), c => struct(
                split(c.getField("dna"), ":").getItem(0).cast("long")
                  .as("gpos"),
                concat(coalesce(col("chromosome"), lit("?")), lit(":"),
                  c.getField("dna")).as("s"))),
              transform(col("_refCovered"), a => struct(
                split(a.getField("adna"), ":").getItem(1).cast("long")
                  .as("gpos"),
                a.getField("adna").as("s"))))),
            e => e.getField("s")), ";")))
      .withColumn("_fs", col("_fsBefore") ||
        coalesce(exists(col("_covered"),
          c => c.getField("p").getField("fs")), lit(false)))
      .withColumn("_nCovered", when(col("_canonAlt"),
        size(col("_covered"))))
      .withColumn("_rf", when(col("frame_idx").isNotNull,
        col("frame_idx").cast("string")).otherwise(lit("-")))

    // --- peptide-level rollup + classification
    val r = col("_rank")
    val rolled = matchStrings
      .groupBy("pepId", "peptide")
      .agg(
        max(coalesce(col("tag"), lit("")).contains("cont")).as("_isCont"),
        max(coalesce(col("tag"), lit("")).contains("ref")).as("_isCanon"),
        max(col("_manual")).as("_foundVariant"),
        min(col("_nCovered")).as("_minChanges"),
        max(coalesce(col("_canonAlt"), lit(false))).as("_hasCanonAlt"),
        max(col("_fs")).as("_hasFs"),
        max(coalesce(col("_covDna"), lit("")).contains(">"))
          .as("_hasAltAllele"),
        count(lit(1)).as("_n"),
        sum(when(col("_isEnst"), 1).otherwise(0)).as("_nEnst"),
        // variant-branch aggregates (all matches)
        stableDedupJoin(r, col("_covPep"), "|").as("_vCovPep"),
        stableDedupJoin(r, col("_covProt"), "|").as("_vCovProt"),
        stableDedupJoin(r, col("_covDna"), "|").as("_vCovDna"),
        orderedJoin(r, col("_acc"), ";").as("_vProts"),
        stableDedupJoin(r, col("transcript"), ";").as("_vTranscripts"),
        stableDedupJoin(r, when(col("transcript").isNotNull, col("gene")),
          ";").as("_vGenes"),
        countDistinct(when(col("transcript").isNotNull, col("gene")))
          .as("_vNGenes"),
        orderedJoin(r, col("pos").cast("string"), ";").as("_vPositions"),
        orderedJoin(r, when(col("transcript").isNotNull,
          col("_preceding").cast("string")), ";").as("_vPreceding"),
        orderedJoin(r, col("_rf"), ";").as("_vRfs"),
        // canonical-branch aggregates (ENST matches only, 240-242)
        orderedJoin(r, when(col("_isEnst"), col("_acc")), ";").as("_cProts"),
        stableDedupJoin(r, when(col("_isEnst"), col("gene")), ";")
          .as("_cGenes"),
        countDistinct(when(col("_isEnst"), col("gene"))).as("_cNGenes"),
        orderedJoin(r, when(col("_isEnst"), col("pos").cast("string")), ";")
          .as("_cPositions"),
        stableDedupJoin(r, when(col("_isEnst") &&
          size(col("_refCovered")) > 0,
          array_join(transform(col("_refCovered"),
            a => a.getField("adna")), ";")), "|").as("_cDna"))
      .withColumn("_minChanges2", coalesce(col("_minChanges"), lit(999999)))

    rolled.select(
      col("pepId"), col("peptide"),
      when(col("_isCont"), "contaminant")
        .when(col("_isCanon"), "canonical")
        .when(col("_foundVariant"), "single-variant(ProVar)")
        .when(col("_minChanges2") > 1 && col("_minChanges2") < 999999 &&
          col("_hasCanonAlt"), "multi-variant")
        .when(col("_hasAltAllele") && col("_hasCanonAlt"), "single-variant")
        .when(col("_hasAltAllele") && !col("_hasCanonAlt") && !col("_hasFs"),
          "variant-no-ref")
        .when(col("_hasFs"), "frameshift")
        .otherwise("canonical-no-ref").as("pep_type1"),
      when(col("_isCont"), "contaminant")
        .otherwise(when(when(col("_isCanon"), col("_nEnst"))
          .otherwise(col("_n")) === 1, "proteoform-specific")
          .when(when(col("_isCanon"), col("_cNGenes"))
            .otherwise(col("_vNGenes")) === 1, "protein-specific")
          .otherwise("multi-gene")).as("pep_type2"),
      when(col("_isCont"), "-").when(col("_isCanon"), "")
        .otherwise(col("_vCovPep")).as("covered_changes_peptide"),
      when(col("_isCont"), "-").when(col("_isCanon"), "")
        .otherwise(col("_vCovProt")).as("covered_changes_protein"),
      when(col("_isCont"), "-").when(col("_isCanon"), col("_cDna"))
        .otherwise(col("_vCovDna")).as("covered_alleles_dna"),
      when(col("_isCont"), "-").when(col("_isCanon"), col("_cProts"))
        .otherwise(col("_vProts")).as("matching_proteins"),
      when(col("_isCont"), "-").when(col("_isCanon"), col("_cProts"))
        .otherwise(col("_vTranscripts")).as("matching_transcripts"),
      when(col("_isCont"), "-").when(col("_isCanon"), col("_cGenes"))
        .otherwise(col("_vGenes")).as("matching_genes"),
      when(col("_isCont"), "-").when(col("_isCanon"), col("_cPositions"))
        .otherwise(col("_vPositions")).as("positions_in_proteins"),
      when(col("_isCont") || col("_isCanon"), "-")
        .otherwise(when(col("_vPreceding") === "", "-")
          .otherwise(col("_vPreceding"))).as("preceding_indel_shift"),
      when(col("_isCont") || col("_isCanon"), "-")
        .otherwise(col("_vRfs")).as("reading_frames"))
  }
}
