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
    * are 1-based.
    */
  def kmerIndex(proteins: DataFrame, k: Int,
                accCol: String = "accession",
                seqCol: String = "sequence"): DataFrame =
    proteins.select(col(accCol).as("accession"),
      col(seqCol).as("sequence"),
      explode(
        when(length(col(seqCol)) >= k,
          transform(sequence(lit(1), length(col(seqCol)) - (k - 1)),
            i => struct(i.as("pos"), col(seqCol).substr(i, lit(k)).as("kmer"))))
          .otherwise(array().cast("array<struct<pos:int,kmer:string>>")))
        .as("km"))
      .select(col("accession"), col("sequence"),
        col("km.pos").as("pos"), col("km.kmer").as("kmer"))

  /** Match peptides (pepId, peptide) into proteins (accession, sequence):
    * every occurrence position of each peptide. Peptides shorter than k are
    * dropped.
    */
  def matchPeptides(peptides: DataFrame, proteins: DataFrame,
                    k: Int = 4): DataFrame = {
    val idx = kmerIndex(proteins, k)
    val peps = peptides
      .where(length(col("peptide")) >= k)
      .withColumn("kmer", col("peptide").substr(1, k))
    peps.join(idx, Seq("kmer"))
      .where(col("sequence").substr(col("pos"), length(col("peptide")))
        === col("peptide"))
      .select(col("pepId"), col("peptide"), col("accession"), col("pos"))
  }
}
