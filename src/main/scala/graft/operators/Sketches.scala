package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed sketches with PORTABLE, engine-independent register math —
  * unlike Spark's built-in `approx_count_distinct` (whose HLL++ register
  * layout is private to Spark and cannot be recomputed by another engine),
  * these sketches hash with md5 and integer folds so an independent SQL
  * engine reproduces the estimate bit-for-bit (the DuckDB oracle does).
  *
  * HyperLogLog, p = 8 (256 registers): md5(value) supplies the register
  * index (first byte) and a 24-bit tail whose leading-zero count feeds the
  * register. Register updates are a map-side-combined max — each map task
  * ships at most 256 rows per group into the shuffle regardless of input
  * size, which is the whole point at 100 TB: a distinct-count whose
  * shuffle is O(groups * 256), not O(distinct values).
  *
  * All register contributions 2^-rho are negative powers of two >= 2^-25,
  * so the per-group double sum is EXACT in IEEE754 regardless of Spark's
  * aggregation order — the one place naive "sum of doubles" actually is
  * deterministic, and why the estimate can be hash-compared at 4 dp.
  */
object Sketches {

  private val m = 256 // registers (p = 8)
  // standard HLL bias constant for m >= 128
  private val alphaExpr = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0))

  /** Per-group approximate distinct count of `valueCol`, one row per
    * group: (groupCols*, hll_estimate). Pair with an exact countDistinct
    * in tests to see the ~1.04/sqrt(256) = 6.5% error bound hold.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String],
                  valueCol: String): DataFrame = {
    val h = md5(col(valueCol).cast("string"))
    val rest = conv(substring(h, 3, 6), 16, 10).cast("long")
    val regs = df.select(
      groupCols.map(col) :+
        conv(substring(h, 1, 2), 16, 10).cast("int").as("_idx") :+
        when(rest === 0, lit(25))
          .otherwise(lit(25) - length(bin(rest))).cast("int").as("_rho"): _*)
      .groupBy(groupCols.map(col) :+ col("_idx"): _*)
      .agg(max(col("_rho")).as("_r"))
    val grouped = regs
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"),
        sum(pow(lit(2.0), -col("_r"))).as("_sp"))
    val zeros = lit(m) - col("_cnt")
    val raw = alphaExpr * lit(m.toDouble * m) /
      (col("_sp") + zeros.cast("double"))
    // HLL small-range correction: linear counting below 2.5m
    val est = when(raw <= lit(2.5 * m) && zeros > 0,
      lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
      .otherwise(raw)
    grouped.select(groupCols.map(col) :+
      round(est, 4).as("hll_estimate"): _*)
  }
}
