package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VCF source.
  *
  * Reference behavior: /root/reference/src/modules/vcf_reader.py (header
  * skip, AF extraction from INFO, allele-validity check) and
  * /root/reference/src/vcf_filter_fix.py (multi-allelic split + AF filter).
  *
  * Spark-first design: a VCF is a splittable text file — `spark.read.text`
  * distributes the scan, header lines are dropped with a filter, and all
  * field parsing is native column expressions (split/regexp), so a 100 TB
  * VCF shard set parses in parallel with whole-stage codegen.
  */
object Vcf {

  /** Read VCF file(s) into the standard parsed schema. */
  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path), "value")

  /** Parse a DataFrame of raw VCF lines (column `c`) into
    * (chrom, pos, id, ref, alt, qual, filter, info, af).
    * Sample genotype columns (if any, fields 10+) are kept as an array.
    */
  def parseLines(lines: DataFrame, c: String): DataFrame = {
    val f = split(col(c), "\t")
    lines
      .where(!col(c).startsWith("#") && length(trim(col(c))) > 0)
      .select(
        f.getItem(0).as("chrom"),
        f.getItem(1).cast("long").as("pos"),
        f.getItem(2).as("id"),
        f.getItem(3).as("ref"),
        f.getItem(4).as("alt"),
        f.getItem(5).as("qual"),
        f.getItem(6).as("filter"),
        f.getItem(7).as("info"),
        slice(f, lit(10), greatest(size(f) - 9, lit(0))).as("genotypes")
      )
      .withColumn("af", infoField(col("info"), "AF").cast("double"))
  }

  /** Extract a key=value field from a VCF INFO string. */
  def infoField(info: Column, key: String): Column =
    regexp_extract(info, "(?:^|;)" + key + "=([^;]+)", 1)

  /** Allele validity per vcf_reader.py:24-27 — REF/ALT must be ACGT runs or
    * the deletion marker "-".
    */
  def validAllele(a: Column): Column = a.rlike("^([ACGT]+|-)$")

  /** Normalize: split multi-allelic rows into one row per ALT, drop invalid
    * alleles, and filter by AF threshold (rows without AF pass only when
    * minAf <= 0, matching check_vcf_line_validity).
    */
  def normalize(parsed: DataFrame, minAf: Double = 0.0): DataFrame = {
    val exploded = parsed
      .withColumn("alt", explode(split(col("alt"), ",")))
      .where(validAllele(col("ref")) && validAllele(col("alt")))
    if (minAf <= 0) exploded
    else exploded.where(col("af").isNotNull && col("af") >= minAf)
  }
}
