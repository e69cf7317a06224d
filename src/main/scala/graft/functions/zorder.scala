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
}
