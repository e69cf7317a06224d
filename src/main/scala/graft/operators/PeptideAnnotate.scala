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
    *
    * `maxPeptideLen`: when the caller can bound the peptide length (tryptic
    * peptides are <= ~50 AA), the index instead carries a
    * `maxPeptideLen`-char sequence WINDOW per position and verification
    * happens INLINE on the k-mer join — no candidate re-join with the
    * protein table. Measured on the uniform-vocabulary pepx fixture
    * (sf0.1, 5M candidates) the window bytes through the k-mer shuffle
    * COST MORE than the re-join they save (9.1 s vs 6.4 s), so the
    * default path stays the re-join; the windowed plan is for when the
    * protein table cannot be joined again cheaply (e.g. sequences held in
    * cold storage, or the index is reused across many peptide batches).
    * Peptides longer than the bound are not matched on this path; within
    * the bound both plans return identical rows.
    */
  def matchPeptides(peptides: DataFrame, proteins: DataFrame,
                    k: Int = 4,
                    maxPeptideLen: Option[Int] = None,
                    broadcastPeptides: Boolean = true): DataFrame = {
    val peps0 = peptides
      .where(length(col("peptide")) >= k)
      .withColumn("kmer", col("peptide").substr(1, k))
    // the peptide list (MS-identified peptides: 1e5-1e6 short strings)
    // is orders of magnitude smaller than the k-mer index (one row per
    // protein POSITION); broadcasting it keeps the index un-shuffled —
    // candidates materialize map-side over the index scan. Measured at
    // the pepx volume (5.9M index rows, 100k peptides): 5.7 s -> 1.6 s.
    // Disable for peptide tables too big to broadcast.
    val peps = if (broadcastPeptides) broadcast(peps0) else peps0
    maxPeptideLen match {
      case None =>
        peps.join(kmerIndex(proteins, k), Seq("kmer"))
          .join(proteins.select(col("accession"), col("sequence")),
            Seq("accession"))
          .where(col("sequence").substr(col("pos"), length(col("peptide")))
            === col("peptide"))
          .select(col("pepId"), col("peptide"), col("accession"), col("pos"))
      case Some(mx) =>
        require(mx >= k, s"maxPeptideLen $mx must be >= k $k")
        val idx = proteins
          .select(col("accession"), col("sequence").as("_seq"))
          .withColumn("wm", explode(
            when(length(col("_seq")) >= k,
              transform(sequence(lit(1), length(col("_seq")) - (k - 1)),
                i => struct(i.as("pos"),
                  col("_seq").substr(i, lit(mx)).as("window"))))
              .otherwise(array()
                .cast("array<struct<pos:int,window:string>>"))))
          .select(col("accession"), col("wm.pos").as("pos"),
            col("wm.window").as("window"))
          .withColumn("kmer", col("window").substr(1, k))
        peps.where(length(col("peptide")) <= mx)
          .join(idx, Seq("kmer"))
          .where(col("window").substr(lit(1), length(col("peptide")))
            === col("peptide"))
          .select(col("pepId"), col("peptide"), col("accession"), col("pos"))
    }
  }
}
