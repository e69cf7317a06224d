package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Peptide variant-coverage annotation.
  *
  * Reference: /root/reference/peptide_annotation/src/
  * peptides_annotate_variation.py:140-446 — for every identified peptide,
  * map its position back into each matching protein, walk the protein's
  * variant list, and report which variants the peptide COVERS (the
  * alternative allele is inside the peptide span and its sequence matches),
  * accounting for the shift introduced by preceding indels and flagging
  * frameshift context. Peptides are classified contaminant > canonical >
  * variant > reference-like by their matched entry tags.
  *
  * Spark-first: matches explode against the parsed change list of each
  * matching protein (small per-row arrays), covered-change verification is
  * a per-row expression, and the per-peptide rollup is one groupBy.
  * Equates I/L like the reference (mass-indistinguishable residues).
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

  /** Annotate peptide->protein matches with covered variants.
    *
    * `matches`: pepId, peptide, accession, pos (1-based within the stored
    * protein sequence, e.g. from PeptideAnnotate.matchPeptides).
    * `proteins`: accession, tag, transcript, chromosome,
    * all_protein_changes (';'-joined, may be empty), dna_changes,
    * protein_prefix_length.
    *
    * Output: one row per peptide with pep_type, covered changes (peptide
    * coords, protein coords, DNA alleles), matching proteins/transcripts,
    * positions and preceding-indel shifts.
    */
  def annotate(matches: DataFrame, proteins: DataFrame): DataFrame = {
    val joined = matches.join(proteins, Seq("accession"), "left")

    // 0-based peptide span within the protein (start-codon offset removed)
    val pepStart = col("pos") - 1 - coalesce(col("protein_prefix_length"),
      lit(0L))
    val pepEnd = pepStart + length(col("peptide"))

    val changes = when(
      col("all_protein_changes").isNull || col("all_protein_changes") === "",
      array().cast("array<string>"))
      .otherwise(split(col("all_protein_changes"), ";"))
    val dnaChanges = when(
      col("dna_changes").isNull || col("dna_changes") === "",
      array().cast("array<string>"))
      .otherwise(split(col("dna_changes"), ";"))

    val parsed = zip_with(changes, dnaChanges, (c, d) => {
      val p = parseChange(c)
      struct(p.as("p"), c.as("raw"), d.as("dna"))
    })

    val perMatch = joined
      .withColumn("_pepStart", pepStart)
      .withColumn("_pepEnd", pepEnd)
      .withColumn("_changes", parsed)
      // shift due to indels strictly before the peptide
      .withColumn("preceding_indels", coalesce(aggregate(col("_changes"),
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
      // whose ALT allele sequence is found at the expected offset
      .withColumn("_covered", filter(col("_changes"), c => {
        val p = c.getField("p")
        val cleanRef = il(regexp_replace(p.getField("refA"), "-", ""))
        val cleanAlt = il(regexp_replace(p.getField("altA"), "-", ""))
        val loc = p.getField("locAlt")
        val inPep = loc >= col("_pepStart") && loc < col("_pepEnd")
        val pepRel = (loc - col("_pepStart")).cast("int")
        val found = il(col("peptide").substr(pepRel + 1,
          length(cleanAlt)))
        val trimmedAlt = cleanAlt.substr(lit(1), length(found))
        (cleanRef =!= cleanAlt || p.getField("fs")) && inPep &&
          found === trimmedAlt
      }))

    val covered = perMatch
      .withColumn("covered_pep", transform(col("_covered"), c => {
        val p = c.getField("p")
        concat((p.getField("locAlt") - col("_pepStart")).cast("string"),
          lit(":"), il(regexp_replace(p.getField("refA"), "-", "")),
          lit(">"), il(regexp_replace(p.getField("altA"), "-", "")))
      }))
      .withColumn("covered_prot", transform(col("_covered"), c =>
        concat(col("transcript"), lit(":"), c.getField("raw"))))
      .withColumn("covered_dna", transform(col("_covered"), c =>
        concat(coalesce(col("chromosome"), lit("?")), lit(":"),
          c.getField("dna"))))
      .withColumn("has_fs_in_pep",
        exists(col("_covered"), c => c.getField("p").getField("fs")) ||
          col("_fsBefore"))

    // peptide-level rollup + classification (contaminant > canonical >
    // variant-covering > reference-like)
    covered
      .groupBy("pepId", "peptide")
      .agg(
        max(when(coalesce(col("tag"), lit("")).contains("cont"), 1)
          .otherwise(0)).as("_isCont"),
        max(when(coalesce(col("tag"), lit("")).contains("sp") ||
          coalesce(col("tag"), lit("")).contains("ensref"), 1)
          .otherwise(0)).as("_isCanon"),
        max(when(size(col("covered_pep")) > 0, 1).otherwise(0))
          .as("_hasVar"),
        array_join(array_distinct(sort_array(collect_list(
          when(size(col("covered_pep")) > 0,
            array_join(col("covered_pep"), ";"))))), "|")
          .as("covered_changes_peptide"),
        array_join(array_distinct(sort_array(collect_list(
          when(size(col("covered_prot")) > 0,
            array_join(col("covered_prot"), ";"))))), "|")
          .as("covered_changes_protein"),
        array_join(array_distinct(sort_array(collect_list(
          when(size(col("covered_dna")) > 0,
            array_join(col("covered_dna"), ";"))))), "|")
          .as("covered_alleles_dna"),
        array_join(sort_array(collect_list(col("accession"))), ";")
          .as("matching_proteins"),
        array_join(array_distinct(sort_array(collect_list(
          coalesce(col("transcript"), lit("-"))))), ";")
          .as("matching_transcripts"),
        array_join(transform(
          array_sort(collect_list(struct(col("accession"), col("pos")))),
          s => s.getField("pos").cast("string")), ";")
          .as("positions_in_proteins"),
        array_join(array_distinct(sort_array(collect_list(
          col("preceding_indels").cast("string")))), ";")
          .as("preceding_indel_shift"),
        max(col("has_fs_in_pep")).as("has_frameshift"))
      .withColumn("pep_type",
        when(col("_isCont") === 1, "contaminant")
          .when(col("_isCanon") === 1, "canonical")
          .when(col("_hasVar") === 1, "variant")
          .otherwise("reference-like"))
      .drop("_isCont", "_isCanon", "_hasVar")
  }
}
