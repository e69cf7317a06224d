package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BED interval source — the lingua franca of genomic region files
  * (bedtools' native format), the natural input to the interval operators
  * (graft.operators.IntervalJoin: containment g2, overlap g4, nearest
  * g5). Not present in the reference pipeline (which carries intervals
  * inside GTF/VCF) — added because a region-file join is the first thing
  * a user of interval operators reaches for.
  *
  * A BED is a splittable text scan parsed with native expressions (same
  * architecture as [[Gtf]]): `track`/`browser`/comment lines drop
  * map-side, fields split on tabs, optional columns 4-6 (name, score,
  * strand) null when absent. COORDINATES: BED is 0-based half-open
  * [start, end); the genomic operators use 1-based inclusive positions
  * (VCF/GTF convention), so [[toIntervals]] converts — mixing the two
  * off-by-one conventions is the classic genomics bug, which is why the
  * conversion is a named step and not left to callers.
  */
object Bed {

  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path), "value")

  def parseLines(lines: DataFrame, c: String): DataFrame = {
    val f = split(regexp_replace(col(c), "\r$", ""), "\t")
    // "." is bedtools' missing-field marker — normalized to null so a
    // write/read round trip is identity on absent fields
    def opt(i: Int) =
      when(size(f) > i && length(f.getItem(i)) > 0 &&
        f.getItem(i) =!= ".", f.getItem(i))
    lines
      .where(!col(c).startsWith("track") && !col(c).startsWith("browser") &&
        !col(c).startsWith("#") && length(trim(col(c))) > 0)
      .select(
        try_element_at(f, lit(1)).as("chrom"),
        // digit-guarded: pushed-down inferred predicates must not
        // ANSI-cast a track/browser/comment row (see sources.Casts)
        Casts.tryLong(try_element_at(f, lit(2))).as("start"),
        Casts.tryLong(try_element_at(f, lit(3))).as("end"),
        opt(3).as("name"),
        Casts.tryLong(opt(4)).as("score"),
        opt(5).as("strand"))
  }

  /** Write a 1-based inclusive interval frame back to BED (the inverse
    * of [[toIntervals]]: bedStart = start-1, bedEnd = end), null optional
    * fields as "." per bedtools convention. A splittable text write —
    * one part file per partition, read back whole by [[read]].
    * Zero-length BED insertion sites do NOT round-trip (toIntervals
    * widened them to one base — a lossy, documented normalization).
    */
  def writeIntervals(intervals: DataFrame, path: String): Unit =
    intervals.select(concat_ws("\t",
      col("chrom"),
      (col("start") - 1).cast("string"),
      col("end").cast("string"),
      coalesce(col("name"), lit(".")),
      coalesce(col("score").cast("string"), lit(".")),
      coalesce(col("strand"), lit("."))).as("value"))
      .write.mode("overwrite").text(path)

  /** 0-based half-open BED rows → the 1-based inclusive (start, end)
    * the interval operators expect. Zero-length BED features (insertion
    * sites, start == end) become the single base AFTER the site, the
    * bedtools convention.
    */
  def toIntervals(bed: DataFrame): DataFrame =
    bed.withColumn("start", col("start") + 1)
      .withColumn("end", greatest(col("end"), col("start")))
}
