package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UCSC chain file source — the cross-assembly alignment format behind
  * liftOver. A chain is `chain score tName tSize tStrand tStart tEnd
  * qName qSize qStrand qStart qEnd id` followed by ungapped block lines
  * `size [dt dq]`; walking the blocks accumulates t/q offsets.
  *
  * Spark-first design: records are blank-line separated, so
  * `lineSep = "\n\n"` keeps the scan splittable; header fields and block
  * triples parse as native split/cast columns, and the offset walk is a
  * per-chain window cumsum (chains are small — tens to thousands of
  * blocks — so the per-chain sort never skews). Output is the BLOCK
  * table liftOver consumes: one row per ungapped block with absolute
  * 0-based half-open t and strand-space q coordinates.
  */
object Chain {

  /** One row per alignment block: (chain_id, score, t_name, t_size,
    * q_name, q_size, q_strand, bt_start, bt_end, qb_start) — t
    * coordinates 0-based half-open on the + strand; q start in the
    * chain's strand space (reverse-end-relative when q_strand = '-',
    * exactly as the file states it).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", "\n\n").text(path)
    val lines = split(trim(col("value")), "\n")
    val recs = raw
      .where(length(trim(col("value"))) > 0)
      .select(lines.as("lines"))
      .select(
        element_at(col("lines"), 1).as("_h"),
        slice(col("lines"), lit(2),
          greatest(size(col("lines")) - 1, lit(0))).as("blocks"))
      .select(split(col("_h"), "[ \t]+").as("h"), col("blocks"))
      .select(
        try_element_at(col("h"), lit(13)).as("chain_id"),
        Casts.tryLong(try_element_at(col("h"), lit(2))).as("score"),
        try_element_at(col("h"), lit(3)).as("t_name"),
        Casts.tryLong(try_element_at(col("h"), lit(4))).as("t_size"),
        Casts.tryLong(try_element_at(col("h"), lit(6))).as("t_chain_start"),
        try_element_at(col("h"), lit(8)).as("q_name"),
        Casts.tryLong(try_element_at(col("h"), lit(9))).as("q_size"),
        try_element_at(col("h"), lit(10)).as("q_strand"),
        Casts.tryLong(try_element_at(col("h"), lit(11))).as("q_chain_start"),
        posexplode(col("blocks")).as(Seq("i", "b")))
      .where(length(trim(col("b"))) > 0)
      .select(col("chain_id"), col("score"), col("t_name"), col("t_size"),
        col("t_chain_start"), col("q_name"), col("q_size"),
        col("q_strand"), col("q_chain_start"), col("i"),
        split(trim(col("b")), "[ \t]+").as("bf"))
      .select(col("*"),
        Casts.tryLong(try_element_at(col("bf"), lit(1))).as("bsize"),
        // the chain's LAST block line is bare "size" — ANSI-safe lookup
        coalesce(Casts.tryLong(try_element_at(col("bf"), lit(2))), lit(0L))
          .as("dt"),
        coalesce(Casts.tryLong(try_element_at(col("bf"), lit(3))), lit(0L))
          .as("dq"))
    val w = Window.partitionBy(col("chain_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    recs
      .select(col("chain_id"), col("score"), col("t_name"), col("t_size"),
        col("q_name"), col("q_size"), col("q_strand"),
        (col("t_chain_start") +
          coalesce(sum(col("bsize") + col("dt")).over(w), lit(0L)))
          .as("bt_start"),
        (col("q_chain_start") +
          coalesce(sum(col("bsize") + col("dq")).over(w), lit(0L)))
          .as("qb_start"),
        col("bsize"))
      .withColumn("bt_end", col("bt_start") + col("bsize"))
  }
}
