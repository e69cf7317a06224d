package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GTF annotation source.
  *
  * Reference uses gffutils to build a feature DB and query children by type
  * (/root/reference/src/parse_gtf.py, get_transcript_list.py, prohap.py).
  * Here a GTF is a splittable text scan parsed with native expressions; the
  * "children of transcript X with feature type exon ordered by start"
  * pattern becomes a groupBy(transcript_id) + sort_array(collect_list),
  * which shuffles once on a well-distributed key.
  */
object Gtf {

  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path), "value")

  /** Parse raw GTF lines into the 8 fixed columns + attribute string.
    * A trailing \r (CRLF input) is stripped from the last field.
    */
  def parseLines(lines: DataFrame, c: String): DataFrame = {
    val f = split(regexp_replace(col(c), "\r$", ""), "\t")
    lines
      .where(!col(c).startsWith("#") && length(trim(col(c))) > 0)
      .select(
        try_element_at(f, lit(1)).as("seqname"),
        try_element_at(f, lit(2)).as("source"),
        try_element_at(f, lit(3)).as("feature"),
        // digit-guarded: pushed-down inferred predicates must not
        // ANSI-cast a '#' comment row (see sources.Casts)
        Casts.tryLong(try_element_at(f, lit(4))).as("start"),
        Casts.tryLong(try_element_at(f, lit(5))).as("end"),
        try_element_at(f, lit(6)).as("score"),
        try_element_at(f, lit(7)).as("strand"),
        try_element_at(f, lit(8)).as("frame"),
        try_element_at(f, lit(9)).as("attributes")
      )
  }

  /** Extract one attribute value (GTF grammar: key "value";). */
  def attr(attributes: Column, key: String): Column =
    regexp_extract(attributes, key + " \"([^\"]*)\"", 1)

  /** Per-transcript exon arrays, ordered by start — the distributed
    * equivalent of gffutils `children(featuretype='exon', order_by='start')`.
    */
  def exonsByTranscript(features: DataFrame): DataFrame =
    features
      .where(col("feature") === "exon")
      .select(attr(col("attributes"), "transcript_id").as("transcript_id"),
        struct(col("start"), col("end")).as("exon"))
      .groupBy("transcript_id")
      .agg(sort_array(collect_list(col("exon"))).as("exons"))

  /** Transcripts filtered by biotype (get_transcript_list.py semantics). */
  def transcriptsByBiotype(features: DataFrame,
                           biotypes: Seq[String]): DataFrame = {
    val t = features.where(col("feature") === "transcript")
      .select(
        col("seqname").as("chromosome"),
        attr(col("attributes"), "transcript_id").as("transcriptID"),
        attr(col("attributes"), "transcript_biotype").as("biotype"),
        col("start"), col("end"), col("strand"))
    if (biotypes.contains("all")) t
    else t.where(col("biotype").isin(biotypes.map(x => x: Any): _*))
  }
}
