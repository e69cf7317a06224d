package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTQ read source (the sequencing ecosystem's raw-reads format):
  * 4-line records — @header, sequence, '+'[description], quality.
  *
  * Unlike every other text format here, FASTQ carries NO per-record sync
  * marker a boundary scan could anchor on: quality lines legally start
  * with '@' (Phred+33 Q31) or '+', so splitting on "\n@" (or any
  * separator) mis-cuts records on perfectly valid data. The only sound
  * record identity is the LINE NUMBER — record = line/4 — so the reader
  * pays for it explicitly: `zipWithIndex` assigns global line numbers
  * (one extra count job over the splittable text scan), then records
  * assemble through ONE hash exchange on the record ordinal, with the
  * map-side partial aggregate collapsing each record's 4 lines before
  * they ship. Both scan and assembly parallelize across executors; the
  * zero-shuffle upgrade path, if FASTQ ingest ever dominates a profile,
  * is the classic Hadoop lookahead record reader (read past the split
  * end to finish the straddling record, skip the leading partial) as a
  * custom InputFormat.
  *
  * Multi-file inputs are fine (each well-formed FASTQ file has a
  * multiple-of-4 line count, so the global ordinal stays phase-aligned
  * across file boundaries); `rec` is the record ordinal in scan order.
  * Malformed records surface as `well_formed = false` rather than
  * corrupting neighbors — the caller decides whether to drop or fail.
  */
object Fastq {

  /** `minPartitions` forces the text scan to split (SourcesSpec uses it
    * to prove records assemble identically when splits land mid-record).
    */
  def read(spark: SparkSession, path: String,
           minPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val raw =
      if (minPartitions > 0) spark.sparkContext.textFile(path, minPartitions)
      else spark.sparkContext.textFile(path)
    val lines = raw.zipWithIndex()
      .map { case (l, i) =>
        (i / 4, (i % 4).toInt, l.stripSuffix("\r"))
      }
      .toDF("rec", "pos", "line")
    def at(p: Int) = max(when(col("pos") === p, col("line")))
    lines.groupBy("rec")
      .agg(at(0).as("h"), at(1).as("sequence"), at(2).as("plus"),
        at(3).as("quality"))
      .select(
        col("rec"),
        regexp_extract(col("h"), "^@(\\S*)", 1).as("read_id"),
        nullif(regexp_extract(col("h"), "^@\\S*\\s+(.*)$", 1), lit(""))
          .as("description"),
        col("sequence"),
        col("quality"),
        // coalesce(false): a truncated trailing record has null plus/
        // quality lines, and null && ... yields null — which a
        // `=== false` malformed-read filter would silently miss
        coalesce(
          col("h").startsWith("@") && col("plus").startsWith("+") &&
            length(col("sequence")) === length(col("quality")),
          lit(false)).as("well_formed"))
  }

  /** FASTQ sink: re-render [[read]]'s schema as 4-line records. Record
    * ORDER is part of the format (paired-end mates align by position
    * across files), so rows range-partition + sort on `rec` — file
    * lexical order IS the record order (the t24 ranged-files contract),
    * one range exchange total. Rows must be well-formed (a null quality
    * would render the string "null" into the file — the caller filters
    * on the reader's `well_formed` flag first, and this writer refuses
    * nulls loudly via an ANSI-safe assert column).
    */
  def write(df: DataFrame, path: String, files: Int = 1): Unit = {
    require(files > 0, "Fastq.write: files must be positive")
    df.repartitionByRange(files, col("rec"))
      .sortWithinPartitions("rec")
      .select(
        // the guard must be a genuinely conditional branch: an
        // equal-branch when(assert_true(...)) gets constant-folded
        // away by SimplifyConditionals, silently dropping the check
        when(col("read_id").isNull || col("sequence").isNull ||
          col("quality").isNull,
          raise_error(lit(
            "Fastq.write: null field — filter on well_formed first")))
          .otherwise(concat(
            lit("@"), col("read_id"),
            when(col("description").isNotNull,
              concat(lit(" "), col("description"))).otherwise(lit("")),
            lit("\n"), col("sequence"), lit("\n+\n"), col("quality")))
          .as("value"))
      .write.mode("overwrite").text(path)
  }
}
