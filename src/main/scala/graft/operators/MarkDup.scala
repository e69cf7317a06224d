package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** samtools-markdup-style PCR/optical duplicate marking over parsed SAM
  * reads (`graft.sources.Sam.read` schema). Reference semantics
  * (samtools markdup / Picard MarkDuplicates): reads are duplicates when
  * their templates share every UNCLIPPED 5' coordinate — for a forward
  * read `pos − leading S/H clips`, for a reverse read
  * `ref_end + trailing S/H clips` (soft-clipped duplicates start at
  * shifted `pos`, which naive position-grouping misses); a PAIR's key is
  * both mates' keys, order-normalized. Within a key group the template
  * with the highest summed base quality survives (ties: smallest qname —
  * samtools keeps first-encountered, which has no stable meaning in a
  * distributed scan, so the tie-break is pinned to qname and documented);
  * every other template's reads — including their secondary/supplementary
  * alignments, which inherit the primary's verdict through the
  * qname join — are marked. Unmapped/ineligible reads pass through
  * unmarked. Incoming 0x400 flags are IGNORED (markdup recomputes).
  *
  * Further documented divergences from samtools markdup (intentional):
  * single-end and paired templates form SEPARATE signature groups, so a
  * single-end read sharing an unclipped 5' with one end of a pair is
  * never marked (samtools prefers the pair and marks the single); and
  * the quality score sums ALL base qualities, not Picard's >= Q15
  * subset — consumers diffing against samtools/Picard output should
  * expect exactly these deltas.
  *
  * Scale shape: one qname-keyed groupBy collapses reads to template rows
  * (map-side partials; a template is 1–2 reads), the signature window
  * runs on the TEMPLATE frame, verdicts join back by qname. At a
  * coordinate-sorted 100 TB BAM the signature groups are position-local,
  * but the general contract is hash distribution — three key-partitioned
  * exchanges, no broadcast of anything read-scale, no skew beyond real
  * duplicate towers (which ARE the signal being measured).
  */
object MarkDup {

  /** Sum of the integers in a (possibly empty) clip-run string. */
  private def numSum(s: Column): Column =
    aggregate(regexp_extract_all(s, lit("\\d+"), lit(0)), lit(0L),
      (a, x) => a + x.cast("long"))

  /** Summed Phred base quality (ASCII − 33), 0 for missing quals. */
  def qualScore(qual: Column): Column =
    when(qual.isNull, lit(0L)).otherwise(aggregate(
      transform(sequence(lit(1), length(qual)),
        i => ascii(substring(qual, i, lit(1))) - 33),
      lit(0L), (a, x) => a + x.cast("long")))

  /** Unclipped 5' duplicate key of one read end, as a portable string
    * `rname:unclippedPos:strand`.
    */
  def endSignature(rname: Column, pos: Column, refEnd: Column,
                   cigar: Column, isReverse: Column): Column = {
    val lead = numSum(regexp_extract(cigar, "^((?:\\d+[SH])+)", 1))
    val trail = numSum(regexp_extract(cigar, "((?:\\d+[SH])+)$", 1))
    val u5 = when(isReverse, refEnd + trail).otherwise(pos - lead)
    concat_ws(":", rname, u5, when(isReverse, "-").otherwise("+"))
  }

  /** Mark duplicates: returns (qname, flag, rname, pos, dup). */
  def markDuplicates(reads: DataFrame): DataFrame = {
    def b(bit: Int) = col("flag").bitwiseAND(lit(bit)) =!= 0
    val eligible = reads
      .where(col("pos").isNotNull && !b(4) && !b(256) && !b(2048))
      .select(col("qname"),
        endSignature(col("rname"), col("pos"), col("ref_end"),
          col("cigar"), col("is_reverse")).as("end_sig"),
        qualScore(col("qual")).as("qs"))
    val templates = eligible
      .groupBy("qname")
      .agg(array_join(array_sort(collect_list(col("end_sig"))), "|")
        .as("sig"),
        sum(col("qs")).as("score"))
    val verdicts = templates
      .withColumn("dup", row_number().over(
        Window.partitionBy("sig")
          .orderBy(col("score").desc, col("qname").asc)) > 1)
      .select(col("qname"), col("dup"))
    reads.join(verdicts, Seq("qname"), "left")
      .select(col("qname"), col("flag"), col("rname"), col("pos"),
        coalesce(col("dup"), lit(false)).as("dup"))
  }
}
