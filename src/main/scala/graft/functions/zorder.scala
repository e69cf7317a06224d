package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve: interleave the bits of two dimensions so that
  * sorting by the single z-value co-locates rows that are close in BOTH
  * dimensions — the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER`.
  * A table range-partitioned/sorted by z gives every file a tight min/max
  * envelope on EACH source column, so parquet row-group stats prune scans
  * for predicates on either dimension (a plain sort can only serve its
  * leading column). The expression is plain literal-shift arithmetic —
  * fully codegen'd, no UDF — and the sort itself is the one Spark already
  * does for `repartitionByRange(...).sortWithinPartitions(...)` writes.
  */
object zorder {

  /** Morton z-value of two non-negative dimensions, interleaving the low
    * `bits` of each (a on even bit positions, b on odd). Mask inputs to
    * `bits` upstream — higher bits are ignored here by construction.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) *
          lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** The z-ordered LAYOUT of a frame: range-partitioned into `numFiles`
    * z-ranges and sorted by z within each — one subsequent parquet write
    * yields files whose row-group min/max stats are tight on BOTH
    * dimensions (`OPTIMIZE ZORDER BY (c1, c2)` as two plan nodes). Inputs
    * are masked to the low `bits` here, so callers pass raw columns; the
    * z key is an expression only — it never lands in the output schema.
    * Cost at scale: exactly one range exchange (sampled boundaries keep
    * the files size-balanced even when the dimensions are skewed) plus
    * the partition-local sort every sorted write needs anyway.
    */
  def zOrdered(df: org.apache.spark.sql.DataFrame, c1: String, c2: String,
               bits: Int = 16, numFiles: Int = 8)
  : org.apache.spark.sql.DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val mask = lit((1L << bits) - 1)
    def z = zValue(df.col(c1).cast("long").bitwiseAND(mask),
      df.col(c2).cast("long").bitwiseAND(mask), bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** z-ordered parquet write: the writer surface over [[zOrdered]]. */
  def writeZOrdered(df: org.apache.spark.sql.DataFrame, path: String,
                    c1: String, c2: String, bits: Int = 16,
                    numFiles: Int = 8): Unit =
    zOrdered(df, c1, c2, bits, numFiles)
      .write.mode("overwrite").parquet(path)
}
