package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Split protein sequences at stop codons ('*') into positioned fragments.
  *
  * Reference: /root/reference/src/remove_stop_codons.py — sequences are cut
  * at the annotated start position (from "start:N" in the description) and
  * at every '*'; fragments before the start are tagged `_5UTR_i`, after the
  * main ORF `_3UTR_i`, and each fragment records its
  * `position_within_protein` (0-based offset in the original sequence,
  * counting the removed '*' characters).
  *
  * Divergence from the reference, on purpose: the reference pairs fragment
  * i with the i-th element of a separately-built stop-position list, which
  * drifts when the 5'UTR contains no stop; here every fragment carries its
  * actual offset, and the `i` in the UTR suffix is the fragment's rank
  * (by position) among the kept fragments — deterministic and
  * self-consistent. The oracle replicates this spec.
  */
object StopSplit {

  /** array<struct<pos,frag>>: '*'-separated fragments of `s` with their
    * 0-based offsets, offset counted from `base`.
    */
  private def splitWithPos(s: Column, base: Column): Column =
    aggregate(
      org.apache.spark.sql.functions.split(s, "\\*", -1),
      struct(
        array().cast("array<struct<pos:long,frag:string>>").as("out"),
        base.cast("long").as("off")),
      (acc, f) => struct(
        concat(acc.getField("out"),
          array(struct(acc.getField("off").as("pos"), f.as("frag"))))
          .as("out"),
        (acc.getField("off") + length(f) + 1).as("off")),
      acc => acc.getField("out"))

  /** Explode (tag, accession, description, sequence) rows into fragments.
    * Output: tag, accession (with _5UTR_i/_3UTR_i suffix), fragment,
    * position_within_protein, start_pos.
    */
  def split(df: DataFrame, minLen: Int = 1): DataFrame = {
    val startStr = regexp_extract(col("description"), "start:([0-9]+)", 1)
    // regexp_extract yields '' on no match; guard the ANSI cast
    val start = coalesce(when(startStr =!= "", startStr).cast("long"),
      lit(0L))
    val frags = when(start > 0,
      concat(
        splitWithPos(col("sequence").substr(lit(1), start.cast("int")),
          lit(0L)),
        splitWithPos(col("sequence")
          .substr(start.cast("int") + 1, length(col("sequence"))), start)))
      .otherwise(splitWithPos(col("sequence"), lit(0L)))
    val kept = filter(frags, f => length(f.getField("frag")) >= minLen)
    df.withColumn("start_pos", start)
      .select(col("tag"), col("accession"), col("start_pos"),
        posexplode(kept).as(Seq("idx", "f")))
      .select(
        col("tag"),
        concat(col("accession"),
          when(col("f.pos") < col("start_pos"),
            concat(lit("_5UTR_"), col("idx")))
            .when(col("f.pos") > col("start_pos"),
              concat(lit("_3UTR_"), col("idx")))
            .otherwise(lit(""))).as("accession"),
        col("f.frag").as("fragment"),
        col("f.pos").as("position_within_protein"),
        col("start_pos"))
  }
}
