package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SubRip (.srt) caption source — the text half of a video training
  * corpus (caption-frame pairs are what multimodal pretraining aligns;
  * m1/m5 handle the container side, this parses the transcript side).
  *
  * Format: blank-line-separated cues of `ordinal\nHH:MM:SS,mmm -->
  * HH:MM:SS,mmm\ntext…` (text may span lines). Like FASTQ, a cue has no
  * per-record sync marker robust to content (caption text can be
  * numeric), so cue identity is positional: lines take a global ordinal
  * (zipWithIndex — one extra count job over the splittable scan), cue id
  * = running count of blank separators, and each cue's lines collapse
  * through ONE hash exchange on the cue id with map-side partial
  * aggregation. Parallelism story at scale: caption corpora are
  * many-small-files — the scan splits across files, and the blank-line
  * cumulative count is a window per file-ordinal range (here one global
  * window; per-file keying via input_file_name is the multi-file path).
  * Malformed cues (bad time line) surface as null times, not a throw.
  */
object Srt {

  private val timeRe =
    "^(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3}) --> " +
      "(\\d{2}):(\\d{2}):(\\d{2})[,.](\\d{3})\\s*$"

  private def ms(h: Int, m: Int, s: Int, f: Int,
                 line: org.apache.spark.sql.Column) =
    Casts.tryLong(regexp_extract(line, timeRe, h)) * 3600000L +
      Casts.tryLong(regexp_extract(line, timeRe, m)) * 60000L +
      Casts.tryLong(regexp_extract(line, timeRe, s)) * 1000L +
      Casts.tryLong(regexp_extract(line, timeRe, f))

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext.textFile(path).zipWithIndex()
      .map { case (l, i) => (i, l.stripSuffix("\r")) }
      .toDF("idx", "line")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("idx"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cues = lines
      .withColumn("_blank", when(length(trim(col("line"))) === 0, 1L)
        .otherwise(0L))
      .withColumn("cue_grp", sum(col("_blank")).over(w))
      .where(col("_blank") === 0)
      .groupBy(col("cue_grp"))
      .agg(sort_array(collect_list(struct(col("idx"), col("line"))))
        .as("_ls"))
      .select(col("cue_grp"),
        transform(col("_ls"), x => x.getField("line")).as("ls"))
      .where(size(col("ls")) >= 2)
    cues.select(
      Casts.tryLong(element_at(col("ls"), 1))
        .as("cue"),
      when(element_at(col("ls"), 2).rlike(timeRe),
        ms(1, 2, 3, 4, element_at(col("ls"), 2))).as("start_ms"),
      when(element_at(col("ls"), 2).rlike(timeRe),
        ms(5, 6, 7, 8, element_at(col("ls"), 2))).as("end_ms"),
      array_join(slice(col("ls"), lit(3), size(col("ls")) - 2), "\n")
        .as("text"))
      .withColumn("duration_ms", col("end_ms") - col("start_ms"))
  }
}
