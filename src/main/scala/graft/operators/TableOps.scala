package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level utilities.
  *
  * Reference: /root/reference/src/merge_tables.py (schema-aligned concat of
  * per-chromosome result tables) and csv_to_vcf.py (projection of an
  * arbitrary CSV into VCF column shape).
  */
object TableOps {

  /** Union tables by column name, filling columns missing on either side
    * with nulls — pd.concat semantics from merge_tables.py.
    */
  def unionTables(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** Project a table into VCF shape (csv_to_vcf.py): configurable source
    * columns, constant-dot QUAL/FILTER/INFO, sorted by (CHROM, POS).
    */
  def csvToVcf(df: DataFrame, chromCol: String = "chrom",
               posCol: String = "pos", idCol: String = "accession",
               refCol: String = "ref", altCol: String = "alt"): DataFrame =
    df.select(
      col(chromCol).as("CHROM"),
      col(posCol).cast("long").as("POS"),
      col(idCol).as("ID"),
      col(refCol).as("REF"),
      col(altCol).as("ALT"),
      lit(".").as("QUAL"),
      lit(".").as("FILTER"),
      lit(".").as("INFO"))
      .orderBy(col("CHROM"), col("POS"))
}
