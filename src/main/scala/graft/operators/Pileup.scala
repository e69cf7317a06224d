package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-position base composition and naive SNV calling from aligned
  * reads — the samtools mpileup / bcftools call composition, driven
  * entirely by the CIGAR (reference context: the reference pipeline
  * CONSUMES called VCFs; this closes the loop from raw alignments).
  *
  * The read→reference base mapping is the part coverage (g7/g8) cannot
  * do: each CIGAR op carries its own (reference, read) offset pair, both
  * running sums over the preceding ops — M/=/X consume both, D/N consume
  * reference only, I/S consume read only, H/P neither. The offsets
  * accumulate in ONE per-row `aggregate` fold over the op list (no
  * window, no join), aligned ops then explode to (ref_pos, base) pairs.
  *
  * Scale: the explode is the honest cost of per-base semantics — rows =
  * aligned bases, exactly the working set samtools walks; everything
  * after is one groupBy(chrom, pos) with map-side partial sums (4 base
  * counters per position cross the shuffle, not base rows), partitioned
  * by position key so a 30x whole-genome pileup spreads evenly. Calling
  * is a broadcast-or-hash join against the reference base table keyed
  * the same way.
  */
object Pileup {

  /** CIGAR ops with per-op reference/read offsets: array of
    * struct(op, len, refoff, readoff). Null for '*' (unmapped).
    */
  private def opsWithOffsets(cigar: Column): Column = {
    val toks = regexp_extract_all(cigar, lit("(\\d+)([MIDNSHP=X])"),
      lit(0))
    val opsType =
      "array<struct<op:string,len:bigint,refoff:bigint,readoff:bigint>>"
    val emptyOps = array().cast(opsType)
    val init = struct(lit(0L).as("refoff"), lit(0L).as("readoff"),
      emptyOps.as("ops"))
    val folded = aggregate(toks, init, (acc, tok) => {
      val op = substring(tok, -1, 1)
      val len = regexp_extract(tok, "(\\d+)", 1).cast("long")
      val refLen = when(op.isin("M", "D", "N", "=", "X"), len)
        .otherwise(lit(0L))
      val readLen = when(op.isin("M", "I", "S", "=", "X"), len)
        .otherwise(lit(0L))
      struct(
        (acc.getField("refoff") + refLen).as("refoff"),
        (acc.getField("readoff") + readLen).as("readoff"),
        concat(acc.getField("ops"), array(struct(
          op.as("op"), len.as("len"),
          acc.getField("refoff").as("refoff"),
          acc.getField("readoff").as("readoff")))).as("ops"))
    })
    when(cigar === "*" || cigar.isNull, lit(null).cast(opsType))
      .otherwise(folded.getField("ops"))
  }

  /** Per-position base composition. `reads` needs (chrom, pos, cigar,
    * seq) — [[graft.sources.Sam.read]] output qualifies after the
    * standard primary/mapped/non-duplicate filter. Output: one row per
    * covered reference position — chrom, pos, n_a/n_c/n_g/n_t, depth
    * (depth counts ACGT plus anything else aligned, e.g. N bases).
    */
  def baseCounts(reads: DataFrame): DataFrame = {
    val aligned = reads
      .where(col("pos").isNotNull && col("cigar").isNotNull &&
        col("cigar") =!= "*" && col("seq").isNotNull)
      .select(col("chrom"), col("pos"), col("seq"),
        explode(opsWithOffsets(col("cigar"))).as("_op"))
      // len > 0: zero-length ops are legal CIGAR ('0M', emitted by some
      // indel realigners) and sequence(0, len-1) would generate a
      // DESCENDING [0, -1] for them — two phantom bases at wrong offsets
      .where(col("_op.op").isin("M", "=", "X") && col("_op.len") > 0)
    val bases = aligned
      .select(col("chrom"),
        (col("pos") + col("_op.refoff")).as("_segStart"),
        col("_op"), col("seq"),
        explode(sequence(lit(0L), col("_op.len") - 1)).as("_k"))
      .select(col("chrom"),
        (col("_segStart") + col("_k")).as("pos"),
        upper(substring(col("seq"),
          (col("_op.readoff") + col("_k") + 1).cast("int"),
          lit(1))).as("base"))
    def cnt(b: String) = sum(when(col("base") === b, 1L).otherwise(0L))
    bases.groupBy(col("chrom"), col("pos"))
      .agg(cnt("A").as("n_a"), cnt("C").as("n_c"), cnt("G").as("n_g"),
        cnt("T").as("n_t"), count(lit(1)).as("depth"))
  }

  /** Naive SNV calls: positions where the most-supported non-reference
    * base clears `minVaf` at `minDepth` coverage. `refBases` is the
    * (chrom, pos, ref) reference table — tiny per contig batch, joined
    * on the same (chrom, pos) key the pileup already groups by. Ties
    * between equally-supported alt bases break to the
    * alphabetically-last base (max struct(count, base) — deterministic,
    * documented). vaf rounds to 5 decimals for the oracle.
    */
  def callVariants(reads: DataFrame, refBases: DataFrame,
                   minDepth: Long = 2, minVaf: Double = 0.5): DataFrame = {
    require(minDepth >= 1 && minVaf > 0 && minVaf <= 1,
      "callVariants: need minDepth >= 1 and 0 < minVaf <= 1")
    val counts = baseCounts(reads)
    // compare on upper(ref): pileup bases are upper()'d, and a
    // soft-masked (lowercase) reference base would otherwise miss the
    // -1 ref-exclusion sentinel and get CALLED as its own variant at
    // every masked position
    val alt = greatest(
      Seq("A", "C", "G", "T").map(b => struct(
        when(upper(col("ref")) =!= b,
          col(s"n_${b.toLowerCase}")).otherwise(lit(-1L)).as("cnt"),
        lit(b).as("base"))): _*)
    counts.join(refBases, Seq("chrom", "pos"))
      .withColumn("_alt", alt)
      .where(col("depth") >= minDepth && col("_alt.cnt") > 0 &&
        col("_alt.cnt").cast("double") / col("depth") >= minVaf)
      .select(col("chrom"), col("pos"), col("ref"),
        col("_alt.base").as("alt"), col("depth"),
        col("_alt.cnt").as("alt_count"),
        round(col("_alt.cnt").cast("double") / col("depth"), 5).as("vaf"))
  }
}
