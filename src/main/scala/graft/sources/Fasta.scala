package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA source & sink.
  *
  * Reference: /root/reference/src/modules/common.py read_fasta (header
  * grammar `>tag|accession|description`, multi-line sequences) and
  * fasta_format_headers.py (writer).
  *
  * Spark-first design: records span lines, so the file is read with
  * `lineSep = "\n>"` — each split boundary lands on a record start and the
  * scan stays splittable/distributed. Header parsing and sequence joining
  * are native expressions.
  */
object Fasta {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", "\n>").text(path)
    // strip \r everywhere (CRLF input; the reference reads in text mode
    // which normalizes newlines), and the '>' kept by the first record
    val rec = regexp_replace(translate(col("value"), "\r", ""), "^>", "")
    val header = substring_index(rec, "\n", 1)
    val seq = translate(
      when(instr(rec, "\n") > 0, rec.substr(length(header) + 2, length(rec)))
        .otherwise(lit("")),
      "\n", "")
    raw
      .where(length(trim(col("value"))) > 0)
      .select(header.as("header"), seq.as("sequence"))
      .select(parseHeader(col("header")).as("h"), col("sequence"))
      .select(col("h.tag").as("tag"), col("h.accession").as("accession"),
        col("h.description").as("description"), col("sequence"))
  }

  /** Parse a FASTA header (without the leading '>') into
    * struct(tag, accession, description) following common.py:16-64:
    *   - piped headers: tag gets "generic_" prefixed unless already generic;
    *     2-part headers may carry "accession description" merged.
    *   - unpiped headers: accession = first token, description = rest.
    */
  def parseHeader(h: Column): Column = {
    val parts = split(h, "\\|")
    val nParts = size(parts)
    val p0 = parts.getItem(0)
    val p1 = parts.getItem(1)
    val p2 = parts.getItem(2)

    val tagPiped = when(p0.contains("generic"), p0)
      .otherwise(concat(lit("generic_"), p0))

    val merged = p1 // 2-part: accession maybe merged with description
    val accPiped2 = when(merged.contains(" "),
      substring_index(merged, " ", 1)).otherwise(merged)
    val descPiped2 = when(merged.contains(" "),
      merged.substr(instr(merged, " ") + 1, length(merged))).otherwise(lit(""))

    val accUnpiped = substring_index(h, " ", 1)
    val descUnpiped = when(h.contains(" "),
      h.substr(instr(h, " ") + 1, length(h))).otherwise(lit(""))

    when(nParts >= 3,
      struct(tagPiped.as("tag"), p1.as("accession"), p2.as("description")))
      .when(nParts === 2,
        struct(tagPiped.as("tag"), accPiped2.as("accession"),
          descPiped2.as("description")))
      .otherwise(
        struct(lit("").as("tag"), accUnpiped.as("accession"),
          descUnpiped.as("description")))
  }

  /** Format headers per fasta_format_headers.py and write a single-line
    * FASTA. Caller controls partitioning; one text file per partition.
    */
  def write(df: DataFrame, path: String,
            tag: Column = col("tag"), accession: Column = col("accession"),
            description: Column = col("description"),
            sequence: Column = col("sequence")): Unit =
    df.select(concat(
      lit(">"), tag, lit("|"), accession, lit("|"), description,
      lit("\n"), sequence).as("value"))
      .write.mode("overwrite").text(path)
}
