package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Haplotype extraction from phased genotypes.
  *
  * Reference: /root/reference/src/modules/get_haplotypes.py — per transcript
  * and individual, collect the variant indices present on each phased copy
  * ("1|…" = copy 1, "…|1" = copy 2), group identical combinations into
  * haplotypes, count occurrences and frequencies, and roll frequencies up
  * per population.
  *
  * Spark-first design: the genotype matrix arrives long (one row per
  * variant x sample). Haplotypes are two aggregations — (transcript, sample,
  * phase) -> ordered variant signature, then (transcript, signature) ->
  * count + samples — both shuffles on well-distributed keys with map-side
  * partial aggregation. No per-transcript driver loop.
  */
object Haplotypes {

  /** Expand genotype rows to one row per phased copy with an `has_alt` flag.
    * Input columns: transcript, sample, varId, pos, gt ("0|1" style).
    */
  def phased(gts: DataFrame): DataFrame =
    gts.withColumn("phase", explode(array(lit(1), lit(2))))
      .withColumn("has_alt",
        when(col("phase") === 1, col("gt").startsWith("1|"))
          .otherwise(col("gt").endsWith("|1")))

  /** Haplotype table: one row per (transcript, signature) where signature is
    * the ';'-joined variant list ordered by (pos, varId), or "REF" for
    * copies carrying no alternative allele. Columns: transcript, signature,
    * hap_count, samples (ordered "sample:phase" list), n_samples, frequency
    * = hap_count / (2 * #samples with genotypes for the transcript).
    */
  def haplotypes(gts: DataFrame): DataFrame = {
    val ph = phased(gts)

    // every phased copy in the data (carriers of REF included)
    val universe = ph.select("transcript", "sample", "phase").distinct()

    val sigs = ph.where(col("has_alt"))
      .groupBy("transcript", "sample", "phase")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("varId")))),
          v => v.getField("varId")),
        ";").as("signature"))

    val perCopy = universe.join(sigs,
      Seq("transcript", "sample", "phase"), "left")
      .withColumn("signature", coalesce(col("signature"), lit("REF")))

    val sampleCounts = universe
      .groupBy("transcript")
      .agg(countDistinct("sample").as("n_samples"))

    perCopy
      .groupBy("transcript", "signature")
      .agg(
        count(lit(1)).as("hap_count"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("sample"), col("phase")))),
            s => concat(s.getField("sample"), lit(":"),
              s.getField("phase").cast("string"))),
          ";").as("samples"))
      .join(sampleCounts, Seq("transcript"))
      .withColumn("frequency",
        round(col("hap_count") / (col("n_samples") * 2.0), 6))
  }

  /** Population frequency rollup: joins a sample->population map and emits
    * per (transcript, signature, population) counts and frequencies
    * (reference: get_haplotypes.py count_freq_pop).
    */
  def populationFrequencies(gts: DataFrame, samplePops: DataFrame): DataFrame = {
    val ph = phased(gts)
    val universe = ph.select("transcript", "sample", "phase").distinct()

    val popSizes = universe.select("sample").distinct()
      .join(samplePops, Seq("sample"))
      .groupBy("population")
      .agg(countDistinct("sample").as("pop_samples"))

    val sigs = ph.where(col("has_alt"))
      .groupBy("transcript", "sample", "phase")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("varId")))),
          v => v.getField("varId")),
        ";").as("signature"))

    universe.join(sigs, Seq("transcript", "sample", "phase"), "left")
      .withColumn("signature", coalesce(col("signature"), lit("REF")))
      .join(samplePops, Seq("sample"))
      .groupBy("transcript", "signature", "population")
      .agg(count(lit(1)).as("pop_count"))
      .join(popSizes, Seq("population"))
      .withColumn("pop_frequency",
        round(col("pop_count") / (col("pop_samples") * 2.0), 6))
  }

  /** Conflict detection: true when any two variants of a haplotype overlap
    * on the reference (same locus affected twice — reference removes such
    * samples, get_haplotypes.py:8-30 cluster_conflicting_mutations).
    * `variants` is array<struct<pos:long, refLen:int>> sorted by pos.
    */
  def hasConflict(variants: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val sorted = array_sort(variants)
    exists(
      zip_with(sorted, slice(sorted, lit(2), greatest(size(sorted) - 1, lit(0))),
        (a, b) => b.isNotNull &&
          (a.getField("pos") + a.getField("refLen") > b.getField("pos"))),
      x => x)
  }
}
