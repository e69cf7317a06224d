package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.dna

/** K-mer counting and the multiplicity spectrum — the jellyfish /
  * GenomeScope workload (error-rate and genome-size estimation from raw
  * reads), and the classic shuffle-heavy distributed-genomics benchmark.
  *
  * Scale design: the k-mer explode is the honest working set (reads ×
  * (len−k+1) rows), but the count is ONE hash aggregation whose map-side
  * partials collapse within-partition duplicates before the exchange —
  * at 30× coverage most k-mers repeat locally, so the shuffled volume is
  * far below the exploded volume. Canonical form (lexicographic min of
  * k-mer and reverse complement) halves the key space and is what makes
  * counts strand-independent; k-mers touching non-ACGT bases are dropped
  * (the jellyfish convention). The spectrum is a second, tiny
  * aggregation over the count table.
  */
object Kmers {

  /** (kmer, cnt) over `seqCol`, canonical by default. */
  def kmerCounts(reads: DataFrame, seqCol: String, k: Int,
                 canonical: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = upper(col(seqCol))
    val starts = when(length(s) >= k,
      sequence(lit(1L), (length(s) - (k - 1)).cast("long")))
      .otherwise(array().cast("array<bigint>"))
    val raw = explode(transform(starts, i => s.substr(i.cast("int"),
      lit(k))))
    val base = reads.select(raw.as("_km"))
      .where(col("_km").rlike("^[ACGT]+$"))
    val keyed =
      if (canonical)
        base.select(least(col("_km"), dna.revComp(col("_km"))).as("kmer"))
      else base.select(col("_km").as("kmer"))
    keyed.groupBy(col("kmer")).agg(count(lit(1)).as("cnt"))
  }

  /** Multiplicity histogram over a k-mer count table:
    * (multiplicity, n_kmers).
    */
  def spectrum(counts: DataFrame): DataFrame =
    counts.groupBy(col("cnt").as("multiplicity"))
      .agg(count(lit(1)).as("n_kmers"))
}
