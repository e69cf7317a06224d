package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Genomic <-> transcript (cDNA) coordinate mapping over exon arrays.
  *
  * Reference: /root/reference/src/modules/coordinates_toolbox.py
  * (get_rna_position_simple, rna_to_dna_loc). Exons arrive as a sorted
  * array<struct<start,end>> column (built once per transcript by
  * Gtf.exonsByTranscript), so the mapping is a pure per-row fold — no join,
  * no shuffle, stays in codegen.
  */
object CoordMap {

  /** 0-based position within the spliced transcript of genomic position
    * `pos` (reference get_rna_position_simple): sum of the lengths of exons
    * fully before pos, plus the offset within the containing exon.
    * Null when pos falls in no exon.
    */
  def rnaPos(exons: Column, pos: Column): Column = {
    val contained = exists(exons,
      e => e.getField("start") <= pos && pos <= e.getField("end"))
    when(contained,
      aggregate(exons, lit(0L), (acc, e) => {
        val s = e.getField("start")
        val en = e.getField("end")
        acc + when(en < pos, en - s + 1)
          .when(s <= pos, pos - s)
          .otherwise(0L)
      }))
  }

  /** Inverse mapping (reference rna_to_dna_loc): genomic position of the
    * 0-based transcript position. -1 when past the transcript end.
    */
  def dnaPos(exons: Column, rnaLoc: Column): Column = {
    val hit = aggregate(
      exons,
      struct(lit(0L).as("accum"), lit(-1L).as("result")),
      (acc, e) => {
        val s = e.getField("start")
        val len = e.getField("end") - s + 1
        val accum = acc.getField("accum")
        val res = acc.getField("result")
        struct(
          (accum + len).as("accum"),
          when(res >= 0, res)
            .when(rnaLoc < accum + len, s + rnaLoc - accum)
            .otherwise(-1L).as("result"))
      },
      acc => acc.getField("result"))
    hit
  }
}
