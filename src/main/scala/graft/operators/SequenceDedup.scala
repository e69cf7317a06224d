package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-sequence aggregation for protein databases.
  *
  * Reference: /root/reference/src/merge_duplicate_seq.py — identical
  * sequences collapse to one FASTA entry; accessions/metadata aggregate into
  * the header; the entry tag is chosen by a fixed priority (contaminants
  * beat reference beats variant/haplotype entries).
  *
  * Spark-first: a single groupBy on the sequence (hash-partitioned shuffle
  * with map-side combine); ordered collect_list keeps the output
  * deterministic.
  */
object SequenceDedup {

  /** Tag priority, highest first (merge_duplicate_seq.py:64-80). */
  val tagPriority: Seq[String] = Seq("generic_cont", "generic_sp",
    "generic_ensref", "generic_ensvar", "generic_var", "generic_manual",
    "generic_enshap", "generic_decoyvar")

  private def tagRank(tag: org.apache.spark.sql.Column) =
    coalesce(
      tagPriority.zipWithIndex.foldRight(
        lit(null).cast("int"): org.apache.spark.sql.Column) {
        case ((t, r), els) => when(tag === t, lit(r)).otherwise(els)
      },
      lit(tagPriority.size))

  /** Merged tag per merge_duplicate_seq.py (cont and sp collapse to cont,
    * unknown tags to other).
    */
  private def mergedTag(minRank: org.apache.spark.sql.Column) = {
    val names = Seq("generic_cont", "generic_cont", "generic_ensref",
      "generic_ensvar", "generic_var", "generic_manual", "generic_enshap",
      "generic_decoyvar")
    names.zipWithIndex.foldRight(lit("generic_other"): org.apache.spark.sql.Column) {
      case ((t, r), els) => when(minRank === r, lit(t)).otherwise(els)
    }
  }

  /** Group identical sequences; aggregate accessions (ordered), keep the
    * highest-priority tag, count duplicates.
    * Input columns: sequence, accession, tag.
    */
  def dedup(df: DataFrame): DataFrame =
    df.groupBy("sequence")
      .agg(
        count(lit(1)).as("n_entries"),
        array_join(sort_array(collect_list(col("accession"))), ";")
          .as("matching_proteins"),
        mergedTag(min(tagRank(col("tag")))).as("tag"))
}
