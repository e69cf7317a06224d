package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GFF3 annotation source — the other format genome annotation ships in
  * (Ensembl/NCBI), sibling of [[Gtf]] with two semantic differences this
  * reader owns so callers cannot get them wrong:
  *   - attributes are `key=value` pairs (not `key "value"`) whose values
  *     are PERCENT-ENCODED (`;` `=` `&` `,` `%` and tab/newline escape as
  *     %XX) — [[attr]] extracts AND decodes;
  *   - hierarchy is explicit via `ID=`/`Parent=`, so "exons of transcript
  *     X" is a Parent equi-group, not an attribute convention —
  *     [[exonsByParent]] mirrors Gtf.exonsByTranscript on it.
  * Same splittable-text-scan architecture as Gtf/Bed: comment/directive
  * lines drop map-side, native expressions only.
  */
object Gff3 {

  def read(spark: SparkSession, path: String): DataFrame =
    parseLines(spark.read.text(path), "value")

  def parseLines(lines: DataFrame, c: String): DataFrame = {
    val f = split(regexp_replace(col(c), "\r$", ""), "\t")
    lines
      .where(!col(c).startsWith("#") && length(trim(col(c))) > 0)
      .select(
        try_element_at(f, lit(1)).as("seqname"),
        try_element_at(f, lit(2)).as("source"),
        try_element_at(f, lit(3)).as("feature"),
        // digit-guarded: pushed-down inferred predicates must not
        // ANSI-cast a '#' directive row (see sources.Casts)
        Casts.tryLong(try_element_at(f, lit(4))).as("start"),
        Casts.tryLong(try_element_at(f, lit(5))).as("end"),
        try_element_at(f, lit(6)).as("score"),
        try_element_at(f, lit(7)).as("strand"),
        try_element_at(f, lit(8)).as("phase"),
        try_element_at(f, lit(9)).as("attributes"))
  }

  /** Percent-decode the characters GFF3 requires encoded in attribute
    * values. %25 must decode LAST or it would re-decode the output of
    * the earlier replacements.
    */
  private[sources] def pctDecode(v: Column): Column = {
    val steps = Seq("%3B" -> ";", "%3D" -> "=", "%26" -> "&",
      "%2C" -> ",", "%09" -> "\t", "%0A" -> "\n", "%25" -> "%")
    steps.foldLeft(v) { case (acc, (enc, dec)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(enc), dec)
    }
  }

  /** Extract one attribute (GFF3 grammar: `key=value;`), percent-decoded;
    * null when absent.
    */
  def attr(attributes: Column, key: String): Column = {
    val raw = regexp_extract(attributes, s"(?:^|;)$key=([^;]*)", 1)
    when(length(raw) > 0, pctDecode(raw))
  }

  /** Per-parent exon arrays ordered by start — the GFF3 counterpart of
    * Gtf.exonsByTranscript, keyed on the explicit Parent link.
    */
  def exonsByParent(features: DataFrame): DataFrame =
    features
      .where(col("feature") === "exon")
      .select(attr(col("attributes"), "Parent").as("parent"),
        struct(col("start"), col("end")).as("exon"))
      .groupBy("parent")
      .agg(sort_array(collect_list(col("exon"))).as("exons"))
}
