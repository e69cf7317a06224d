package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Variant-level QC statistics: the bcftools-stats / plink-mendel style
  * summaries a cohort pipeline runs right after VCF normalization
  * (reference context: vcf_filter_fix.py emits the normalized rows these
  * summaries consume; the reference itself defers QC to bcftools).
  *
  * Scale: [[variantStats]] is one groupBy(chrom) of conditional sums —
  * map-side partials reduce each scan task to a handful of longs per
  * chromosome, the only exchange is ~25 tiny rows. [[mendelViolations]]
  * shuffles the genotype matrix once on (variant, sample) for each of the
  * two parent joins with the trio table broadcast — no per-sample driver
  * loop, so a 100k-sample biobank cohort partitions across executors.
  */
object VcfStats {

  private def isSnp: Column =
    length(col("ref")) === 1 && length(col("alt")) === 1

  /** Transition (purine<->purine / pyrimidine<->pyrimidine) SNV — the
    * ti/tv ratio's numerator; ~2.0-2.1 genome-wide is the classic
    * sanity check for call-set quality.
    */
  private def isTransition: Column =
    (col("ref") === "A" && col("alt") === "G") ||
      (col("ref") === "G" && col("alt") === "A") ||
      (col("ref") === "C" && col("alt") === "T") ||
      (col("ref") === "T" && col("alt") === "C")

  /** Per-chromosome variant-class counts over normalized (one row per
    * ALT allele) variants: SNVs, insertions, deletions, MNPs,
    * transitions/transversions and the ti/tv ratio (null when tv = 0;
    * rounded to 5 decimals so the SQL oracle matches bit-exactly).
    */
  def variantStats(vcfNorm: DataFrame): DataFrame = {
    val snp = isSnp
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    vcfNorm.groupBy(col("chrom"))
      .agg(
        count(lit(1)).as("n_variants"),
        cnt(snp).as("n_snp"),
        cnt(length(col("alt")) > length(col("ref"))).as("n_ins"),
        cnt(length(col("alt")) < length(col("ref"))).as("n_del"),
        cnt(!snp && length(col("alt")) === length(col("ref")))
          .as("n_mnp"),
        cnt(snp && isTransition).as("n_ti"),
        cnt(snp && !isTransition).as("n_tv"))
      .withColumn("ti_tv",
        when(col("n_tv") > 0,
          round(col("n_ti").cast("double") / col("n_tv"), 5)))
  }

  /** ALT-allele dosage of a diploid genotype string ("a|b" or "a/b",
    * post-[[graft.sources.Vcf.normalize]] so alleles are 0/1/'.'):
    * number of '1' alleles, null when any allele is missing.
    */
  def dosage(gt: Column): Column = {
    val alleles = split(gt, "[|/]")
    when(array_contains(alleles, "."), lit(null).cast("int"))
      .otherwise(size(filter(alleles, _ === "1")))
  }

  /** plink-mendel-style Mendelian-consistency check for trios on diploid
    * biallelic genotypes. `gts` is the long genotype matrix — one row per
    * (varId, chrom, pos, sample, gt); `trios` is (child, mother, father),
    * tiny, broadcast. Each parent contributes exactly one allele, so the
    * child's feasible ALT-dosage interval given parent dosages is
    * [ (momD==2)+(dadD==2), (momD>=1)+(dadD>=1) ]; a call outside it is a
    * Mendelian violation. Rows with any missing genotype in the trio are
    * dropped (plink skips incomplete trios). X/Y hemizygous logic is the
    * caller's to apply upstream (filter or re-code), as in the
    * Haplotypes PAR handling — this operator is autosomal-diploid.
    */
  def mendelViolations(gts: DataFrame, trios: DataFrame): DataFrame = {
    val d = gts.select(col("varId"), col("chrom"), col("pos"),
      col("sample"), dosage(col("gt")).as("d"))
      .where(col("d").isNotNull)
    val childG = d.join(broadcast(trios), col("sample") === col("child"))
      .select(col("varId"), col("chrom"), col("pos"), col("child"),
        col("mother"), col("father"), col("d").as("child_dose"))
    val momG = d.select(col("varId"), col("sample").as("mother"),
      col("d").as("mother_dose"))
    val dadG = d.select(col("varId"), col("sample").as("father"),
      col("d").as("father_dose"))
    childG
      .join(momG, Seq("varId", "mother"))
      .join(dadG, Seq("varId", "father"))
      .select(col("varId"), col("chrom"), col("pos"), col("child"),
        col("child_dose"), col("mother_dose"), col("father_dose"),
        (col("child_dose") <
          (when(col("mother_dose") === 2, 1).otherwise(0) +
            when(col("father_dose") === 2, 1).otherwise(0)) ||
          col("child_dose") >
            (when(col("mother_dose") >= 1, 1).otherwise(0) +
              when(col("father_dose") >= 1, 1).otherwise(0)))
          .as("violation"))
  }
}
