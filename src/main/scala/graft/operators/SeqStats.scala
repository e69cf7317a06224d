package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence-composition statistics over a (key, sequence) table —
  * bedtools-nuc-style windowed base content (reference context: the
  * genome/cDNA FASTA tables the reference pipeline reads via
  * common.py:16-71; composition QC itself is deferred to bedtools there).
  *
  * Scale: [[gcWindows]] is a single projection + explode with ZERO
  * shuffles. The sequence is cut into windows in ONE regexp pass
  * (`.{1,w}` extract-all), so the per-row working set is O(sequence
  * length) — a naive per-window substring over an exploded index would
  * materialize O(length x windows) bytes per chromosome, which is the
  * difference between streaming a 250 Mb contig and copying it 2.5M
  * times. Base counts are length-difference probes over `translate`
  * (the t20 entropy pattern) — pure codegen'd string arithmetic, no UDF.
  */
object SeqStats {

  private def nOf(win: Column, chars: String): Column =
    length(win) - length(translate(win, chars, ""))

  /** Fixed windows of `windowSize` bases over each sequence (the last
    * window may be short): 1-based [win_start, win_end], A/T, G/C and N
    * counts, and the GC fraction over called (non-N) bases — null when a
    * window is all N. Case-insensitive (soft-masked lowercase counts).
    */
  def gcWindows(seqs: DataFrame, windowSize: Int,
                keys: Seq[String] = Seq("chrom"),
                seqCol: String = "sequence"): DataFrame = {
    require(windowSize >= 1, "gcWindows: windowSize must be >= 1")
    val kc = keys.map(col)
    val gc = nOf(col("_win"), "GC")
    val at = nOf(col("_win"), "AT")
    seqs
      .select(kc :+ posexplode(regexp_extract_all(upper(col(seqCol)),
        lit(s".{1,$windowSize}"), lit(0))).as(Seq("_i", "_win")): _*)
      .select(kc ++ Seq(
        (col("_i").cast("long") * windowSize + 1).as("win_start"),
        (col("_i").cast("long") * windowSize + length(col("_win")))
          .as("win_end"),
        at.cast("long").as("n_at"),
        gc.cast("long").as("n_gc"),
        nOf(col("_win"), "N").cast("long").as("n_n"),
        when(at + gc > 0,
          round(gc.cast("double") / (at + gc), 5)).as("gc_frac")): _*)
  }
}
