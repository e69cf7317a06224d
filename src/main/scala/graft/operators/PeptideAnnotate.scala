package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Peptide-to-protein matching.
  *
  * Reference: /root/reference/peptide_annotation/src/
  * peptides_annotate_variation.py maps identified peptides back to the
  * protein sequences that contain them (then to haplotypes/variants via
  * header metadata).
  *
  * Spark-first: a contains-join is not equi-joinable, so proteins are
  * indexed by their k-mers once (explode), peptides key by their k-mer
  * prefix, and the equi-join on the k-mer is followed by an exact substring
  * check at the candidate position. The k-mer index is ~seq_len rows per
  * protein — linear blowup, hash-joinable, no cross product.
  */
object PeptideAnnotate {

  /** All (accession, position, kmer) for each protein sequence; positions
    * are 1-based. Index rows are NARROW — they do not carry the protein
    * sequence (a k-mer row set carrying the full sequence would shuffle
    * O(len^2) bytes per protein); candidates re-join the protein table by
    * accession for verification.
    */
  def kmerIndex(proteins: DataFrame, k: Int,
                accCol: String = "accession",
                seqCol: String = "sequence"): DataFrame =
    proteins.select(col(accCol).as("accession"),
      col(seqCol).as("_seq"))
      .withColumn("km", explode(
        when(length(col("_seq")) >= k,
          transform(sequence(lit(1), length(col("_seq")) - (k - 1)),
            i => struct(i.as("pos"), col("_seq").substr(i, lit(k)).as("kmer"))))
          .otherwise(array().cast("array<struct<pos:int,kmer:string>>"))))
      .select(col("accession"), col("km.pos").as("pos"),
        col("km.kmer").as("kmer"))

  /** Match peptides (pepId, peptide) into proteins (accession, sequence):
    * every occurrence position of each peptide. Peptides shorter than k are
    * dropped. Join order: narrow kmer equi-join generates candidate
    * (peptide, accession, pos) rows; the protein sequences join back once
    * per candidate for the exact substring check.
    */
  def matchPeptides(peptides: DataFrame, proteins: DataFrame,
                    k: Int = 4): DataFrame = {
    val idx = kmerIndex(proteins, k)
    val peps = peptides
      .where(length(col("peptide")) >= k)
      .withColumn("kmer", col("peptide").substr(1, k))
    peps.join(idx, Seq("kmer"))
      .join(proteins.select(col("accession"), col("sequence")),
        Seq("accession"))
      .where(col("sequence").substr(col("pos"), length(col("peptide")))
        === col("peptide"))
      .select(col("pepId"), col("peptide"), col("accession"), col("pos"))
  }
}
