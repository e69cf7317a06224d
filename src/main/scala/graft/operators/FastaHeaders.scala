package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FASTA header post-processing over parsed (tag, accession, description,
  * sequence) rows.
  *
  * Reference: /root/reference/src/fasta_format_headers.py (normalize the
  * >tag|accession|description grammar, optional ENST accession promotion,
  * guarantee a matching_proteins: annotation),
  * fasta_simplify_headers.py (per-gene simplified entries, duplicating
  * multi-gene sequences), and remove_UTR_seq.py (drop list entries that
  * only cover UTR fragments, dropping the row when none remain).
  */
object FastaHeaders {

  private def enstFrom(desc: Column, prefix: String): Column =
    regexp_extract(desc, prefix + "([^\\s.]*)", 0)

  /** fasta_format_headers.py: ensure generic_ tag, optionally promote the
    * accession embedded in the description (use_ENST), and append
    * " matching_proteins:<accession>" when absent (exact reference
    * concatenation, including the leading space on empty descriptions).
    */
  def formatHeaders(df: DataFrame, customTag: String = "",
                    useEnst: Boolean = false,
                    enstPrefix: String = "ENST"): DataFrame = {
    val tag = when(col("tag") === "", concat(lit("generic"), lit(customTag)))
      .otherwise(col("tag"))
    val acc =
      if (useEnst)
        when(col("description").contains(enstPrefix),
          enstFrom(col("description"), enstPrefix))
          .otherwise(col("accession"))
      else col("accession")
    val desc = when(!col("description").contains("matching_proteins:"),
      concat(col("description"), lit(" matching_proteins:"), acc))
      .otherwise(col("description"))
    df.select(tag.as("tag"), acc.as("accession"), desc.as("description"),
      col("sequence"))
  }

  /** remove_UTR_seq.py: the description carries parallel ';'-lists
    * (matching_proteins / position_within_protein / start / reading_frame /
    * split_sequences); drop every index whose split-sequence id contains
    * "UTR", and the whole row when nothing is left.
    */
  def removeUtrEntries(df: DataFrame): DataFrame = {
    def listOf(key: String): Column =
      split(regexp_extract(col("description"), key + ":([^ ]*)", 1), ";")
    val splitIds = listOf("split_sequences")
    def keep(values: Column): Column =
      filter(zip_with(values, splitIds,
        (v, s) => struct(v.as("v"), s.as("s"))),
        p => !p.getField("s").contains("UTR"))
    def joined(values: Column): Column =
      array_join(transform(keep(values), p => p.getField("v")), ";")
    df
      .withColumn("_kept", keep(listOf("matching_proteins")))
      .where(size(col("_kept")) > 0)
      .select(col("tag"), col("accession"),
        concat(
          lit("position_within_protein:"),
          joined(listOf("position_within_protein")),
          lit(" start:"), joined(listOf("start")),
          lit(" matching_proteins:"), joined(listOf("matching_proteins")),
          lit(" reading_frame:"), joined(listOf("reading_frame")))
          .as("description"),
        col("sequence"))
  }

  /** fasta_simplify_headers.py: one simplified entry per (sequence, gene);
    * sequences matching several genes are duplicated with `.i` suffixes.
    *
    * `haploMap`: (haplo_accession, transcript) for enshap entries.
    * `geneMap`: (transcript, gene) — gene_name falling back to gene_id.
    * `transcriptPrefix`: canonical transcript id prefix (ENST for Ensembl).
    */
  def simplifyHeaders(df: DataFrame, haploMap: DataFrame,
                      geneMap: DataFrame,
                      transcriptPrefix: String = "ENST"): DataFrame = {
    val ids = split(regexp_extract(col("description"),
      "matching_proteins:([^ ]*)", 1), "[;,]")
    val base = df.withColumn("_ids", ids)

    val cont = base.where(col("tag") === "generic_cont")
      .select(col("accession"), col("tag"), col("sequence"),
        concat(lit("CONTAMINANT GN="),
          array_join(filter(col("_ids"),
            i => !i.startsWith(transcriptPrefix) &&
              !i.startsWith("haplo_") && !i.startsWith("var_")), ";"))
          .as("gene"))

    val refT = base.where(col("tag") === "generic_ensref")
      .select(col("accession"), col("tag"), col("sequence"),
        explode(filter(col("_ids"), i => i.startsWith(transcriptPrefix)))
          .as("transcript"))
    val hapT = base.where(col("tag") === "generic_enshap")
      .select(col("accession"), col("tag"), col("sequence"),
        explode(filter(col("_ids"), i => i.startsWith("haplo_")))
          .as("haplo"))
      .join(haploMap, Seq("haplo"))
    val varT = base.where(col("tag") === "generic_var")
      .select(col("accession"), col("tag"), col("sequence"),
        explode(filter(col("_ids"), i => i.startsWith("var_"))).as("vid"))
      .withColumn("transcript", concat(lit(transcriptPrefix),
        split(regexp_extract(col("vid"),
          transcriptPrefix + "(.*)", 1), "_").getItem(0)))
      .drop("vid")

    val gened = refT.unionByName(
      hapT.select(refT.columns.toIndexedSeq.map(col): _*))
      .unionByName(varT.select(refT.columns.toIndexedSeq.map(col): _*))
      .join(geneMap, Seq("transcript"))
      .groupBy("accession", "tag", "sequence")
      .agg(array_distinct(sort_array(collect_list(col("gene"))))
        .as("genes"))
      .select(col("accession").as("acc0"), col("tag"), col("sequence"),
        posexplode(col("genes")).as(Seq("gi", "gene")),
        size(col("genes")).as("ng"))
      .select(
        when(col("ng") > 1,
          concat(col("acc0"), lit("."), col("gi"))).otherwise(col("acc0"))
          .as("accession"),
        col("tag"), col("sequence"), concat(lit("GN="), col("gene"))
          .as("gene"))

    cont.select("accession", "tag", "gene", "sequence")
      .unionByName(gened.select("accession", "tag", "gene", "sequence"))
  }
}
