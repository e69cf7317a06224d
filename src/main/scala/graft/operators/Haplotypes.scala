package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Haplotype extraction from phased genotypes.
  *
  * Reference: /root/reference/src/modules/get_haplotypes.py — per transcript
  * and individual, collect the variants present on each phased copy
  * ("1|…" = copy 1, "…|1" = copy 2), group identical combinations into
  * haplotypes, count occurrences and frequencies, roll frequencies up per
  * population. X-chromosome handling (get_haplotypes.py:92,118,226-230):
  * male samples outside the pseudo-autosomal regions carry ONE copy (copy 1
  * only) and count once in the frequency denominator; haplotypes whose
  * variants overlap on the reference are conflicts and their carriers are
  * dropped (cluster_conflicting_mutations, get_haplotypes.py:8-30,172-184).
  *
  * Spark-first design: the genotype matrix arrives long (one row per
  * variant x sample). Haplotypes are two aggregations — (transcript, sample,
  * phase) -> ordered variant signature, then (transcript, signature) ->
  * count + samples — both shuffles on well-distributed keys with map-side
  * partial aggregation. No per-transcript driver loop.
  */
object Haplotypes {

  /** Per-transcript "autosomal" flag per get_haplotypes.py:92 — everything
    * is autosomal on non-X chromosomes; on X only transcripts fully inside
    * PAR1 or PAR2 count as autosomal.
    */
  def isAutosomal(tStart: Column, tEnd: Column, isXChrom: Boolean,
                  par1To: Long, par2From: Long): Column =
    if (!isXChrom) lit(true)
    else (tStart < par1To && tEnd <= par1To) ||
      (tStart >= par2From && tEnd > par2From)

  /** Expand genotype rows to one row per phased copy with an `has_alt` flag.
    * Input columns: transcript, sample, varId, pos, gt ("0|1" style), plus
    * an `autosomal` boolean and a `sex` column ("male"/"female") when
    * ploidy-aware (male X non-PAR samples carry copy 1 only).
    */
  def phased(gts: DataFrame): DataFrame = {
    val copies =
      if (gts.columns.contains("autosomal") && gts.columns.contains("sex"))
        when(col("autosomal") || col("sex") =!= "male", array(lit(1), lit(2)))
          .otherwise(array(lit(1)))
      else array(lit(1), lit(2))
    gts.withColumn("phase", explode(copies))
      .withColumn("has_alt",
        when(col("phase") === 1, col("gt").startsWith("1|"))
          .otherwise(col("gt").endsWith("|1")))
  }

  /** Conflict flag for a haplotype's variant set: any two variants whose
    * reference spans [pos, pos+refLen] touch or overlap. Matches the
    * reference sweep (get_haplotypes.py:8-30) exactly, including the
    * boundary case: a start event at the same locus as an end event sorts
    * BEFORE it (Python stable sort, starts listed first), so touching
    * intervals — even two adjacent SNPs — conflict.
    * `variants` is array<struct<pos:long, refLen:int>>.
    */
  def hasConflict(variants: Column): Column = {
    val sorted = array_sort(variants)
    exists(
      zip_with(sorted,
        slice(sorted, lit(2), greatest(size(sorted) - 1, lit(0))),
        (a, b) => b.isNotNull &&
          (a.getField("pos") + a.getField("refLen") >= b.getField("pos"))),
      x => x)
  }

  /** Haplotype table. Input gts columns: transcript, sample, varId, pos,
    * ref, gt; optionally autosomal + sex (see [[phased]]). One row per
    * (transcript, signature): signature is the ';'-joined variant list
    * ordered by pos (or "REF"), hap_count, samples ("sample:phase" ordered
    * list), frequency = hap_count / denominator where the denominator is
    * 2*n_samples, except male X non-PAR copies which count once
    * (get_haplotypes.py:221-230). Conflicted signatures (overlapping
    * variants) are dropped, as the reference drops their carrier samples.
    */
  def haplotypes(gts: DataFrame): DataFrame = {
    val ph = phased(gts)

    // every phased copy in the data (carriers of REF included)
    val universe = ph.select("transcript", "sample", "phase").distinct()

    val sigs = ph.where(col("has_alt"))
      .groupBy("transcript", "sample", "phase")
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("varId")))),
            v => v.getField("varId")),
          ";").as("signature"),
        hasConflict(collect_list(struct(col("pos"),
          length(col("ref")).as("refLen")))).as("conflict"))

    val perCopy = universe.join(sigs,
      Seq("transcript", "sample", "phase"), "left")
      .withColumn("signature", coalesce(col("signature"), lit("REF")))
      .withColumn("conflict", coalesce(col("conflict"), lit(false)))

    // denominator: total phased copies per transcript (2 per sample, 1 for
    // male X non-PAR copies — already reflected in the universe ploidy)
    val copyCounts = universe
      .groupBy("transcript")
      .agg(count(lit(1)).as("total_copies"))

    perCopy
      .where(!col("conflict"))
      .groupBy("transcript", "signature")
      .agg(
        count(lit(1)).as("hap_count"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("sample"), col("phase")))),
            s => concat(s.getField("sample"), lit(":"),
              s.getField("phase").cast("string"))),
          ";").as("samples"))
      .join(copyCounts, Seq("transcript"))
      .withColumn("frequency",
        round(col("hap_count") / col("total_copies"), 6))
      .drop("total_copies")
  }

  /** Population frequency rollup (reference: get_haplotypes.py
    * count_freq_pop): per (transcript, signature, population) counts with
    * denominators that count male X non-PAR samples once
    * (pop_male + 2*(pop_n - pop_male)).
    * samplePops columns: sample, population (+ sex when ploidy-aware).
    */
  def populationFrequencies(gts: DataFrame, samplePops: DataFrame): DataFrame = {
    val ph = phased(gts)
    val universe = ph.select("transcript", "sample", "phase").distinct()

    // per-transcript population copy counts from the universe's own ploidy
    val popCopies = universe
      .join(samplePops.select("sample", "population"), Seq("sample"))
      .groupBy("transcript", "population")
      .agg(count(lit(1)).as("pop_copies"))

    val sigs = ph.where(col("has_alt"))
      .groupBy("transcript", "sample", "phase")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("varId")))),
          v => v.getField("varId")),
        ";").as("signature"))

    universe.join(sigs, Seq("transcript", "sample", "phase"), "left")
      .withColumn("signature", coalesce(col("signature"), lit("REF")))
      .join(samplePops.select("sample", "population"), Seq("sample"))
      .groupBy("transcript", "signature", "population")
      .agg(count(lit(1)).as("pop_count"))
      .join(popCopies, Seq("transcript", "population"))
      .withColumn("pop_frequency",
        round(col("pop_count") / col("pop_copies"), 6))
      .drop("pop_copies")
  }
}
