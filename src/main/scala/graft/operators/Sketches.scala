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

  /** HLL set algebra — the audience-overlap estimator: registers are
    * MAX-mergeable (the property that makes HLL THE distributed
    * distinct sketch), so |A∪B| comes from merging the two cohorts'
    * register sets without touching rows again, and |A∩B| from
    * inclusion-exclusion |A| + |B| − |A∪B| (clamped at 0 — I-E can go
    * negative within sketch error). Register sums are EXACT in doubles
    * (≤256 powers of two spanning 33 bits < the 53-bit mantissa), so
    * every estimate is aggregation-order-independent — the q15
    * portability argument extended to set operations. Output is ONE
    * row: est_a/est_b/est_union/est_intersection/jaccard_est plus the
    * exact intersection for calibration (the gate wants truth next to
    * the estimate; production reads only the sketches — 256 bytes per
    * cohort, mergeable across any partitioning).
    */
  def hllSetOps(df: DataFrame, labelCol: String, valueCol: String,
                a: String, b: String): DataFrame = {
    val h = md5(col(valueCol).cast("string"))
    val rest = conv(substring(h, 3, 6), 16, 10).cast("long")
    val regs = df.where(col(labelCol).isin(a, b)).select(
      col(labelCol).as("_lbl"),
      conv(substring(h, 1, 2), 16, 10).cast("int").as("_idx"),
      when(rest === 0, lit(25))
        .otherwise(lit(25) - length(bin(rest))).cast("int").as("_rho"))
      .groupBy(col("_lbl"), col("_idx"))
      .agg(max(col("_rho")).as("_r"))
    def estOf(regDf: DataFrame, keyCols: Seq[String]): DataFrame = {
      val grouped = regDf.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("_cnt"),
          sum(pow(lit(2.0), -col("_r"))).as("_sp"))
      val zeros = lit(m) - col("_cnt")
      val raw = alphaExpr * lit(m.toDouble * m) /
        (col("_sp") + zeros.cast("double"))
      val e = when(raw <= lit(2.5 * m) && zeros > 0,
        lit(m.toDouble) * log(lit(m.toDouble) / zeros.cast("double")))
        .otherwise(raw)
      grouped.select(keyCols.map(col) :+ e.as("_est"): _*)
    }
    val ab = estOf(regs, Seq("_lbl")).agg(
      max(when(col("_lbl") === a, col("_est"))).as("_ea"),
      max(when(col("_lbl") === b, col("_est"))).as("_eb"))
    val u = estOf(regs.groupBy(col("_idx")).agg(max(col("_r")).as("_r")),
      Seq.empty).select(col("_est").as("_eu"))
    val exact = df.where(col(labelCol).isin(a, b))
      .groupBy(col(valueCol))
      .agg(countDistinct(col(labelCol)).as("_nl"))
      .agg(sum(when(col("_nl") === 2, 1L).otherwise(0L))
        .as("exact_intersection"))
    val inter = greatest(lit(0.0), col("_ea") + col("_eb") - col("_eu"))
    ab.crossJoin(u).crossJoin(exact)
      .select(round(col("_ea"), 4).as("est_a"),
        round(col("_eb"), 4).as("est_b"),
        round(col("_eu"), 4).as("est_union"),
        round(inter, 4).as("est_intersection"),
        round(inter / col("_eu"), 4).as("jaccard_est"),
        col("exact_intersection"))
  }

  /** Count-Min-sketch heavy hitters: estimate per-value frequencies
    * through a d x w counter matrix (md5-hashed, salted per row) and
    * report the top values by the CMS estimate = min over rows of the
    * value's counter. The sketch build is the scalable part — the
    * shuffle carries at most d*w counter rows total (here 4*256 = 1024)
    * no matter the input size, the same state a streaming heavy-hitter
    * would keep. The candidate set evaluated against the sketch is the
    * distinct values (fine at |domain| << |input|; at an unbounded
    * domain you'd track candidates with SpaceSaving on top).
    *
    * CMS guarantee surfaced in the output: estimate >= true count
    * always (collisions only ever inflate), asserted in OpsSpec and
    * visible next to the exact count.
    */
  def cmsTopK(df: DataFrame, valueCol: String, k: Int,
              depth: Int = 4, width: Int = 256): DataFrame = {
    graft.plans.BoundedTopK.register(df.sparkSession)
    def bucket(row: Int, v: Column): Column =
      pmod(conv(substring(md5(concat(lit(row.toString), lit(":"),
        v.cast("string"))), 1, 7), 16, 10).cast("long"), lit(width))
    def buckets(v: Column): Column =
      posexplode(array((0 until depth).map(r => bucket(r, v)): _*))
    // d x w counters, one narrow map-combined shuffle of (row, bucket)
    val counters = df
      .select(buckets(col(valueCol)).as(Seq("_row", "_bucket")))
      .groupBy("_row", "_bucket").agg(count(lit(1)).as("_cnt"))
    // each distinct value reads its d counters; estimate = min of them
    val scored = df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n_true"))
      .select(col("value"), col("n_true"),
        buckets(col("value")).as(Seq("_row", "_bucket")))
      .join(broadcast(counters), Seq("_row", "_bucket"))
      .groupBy("value")
      .agg(max(col("n_true")).as("n_true"),
        min(col("_cnt")).as("cms_estimate"))
    val top = scored
      .groupBy(lit(1).as("_g"))
      .agg(expr(s"${graft.plans.BoundedTopK.name}" +
        s"(struct(CAST(cms_estimate AS DOUBLE), value), $k)").as("_tk"))
      .select(posexplode(col("_tk")).as(Seq("_r", "_e")))
      .select(col("_e.id").as("value"),
        (col("_r") + 1).cast("long").as("rank"))
    top.join(scored, Seq("value"))
      .select(col("value"), col("n_true"), col("cms_estimate"), col("rank"))
  }

  /** Histogram-sketch quantiles: one pass reduces the input to
    * (group, bucket) counts — buckets are fixed-width `floor(v/binWidth)`
    * cells, so the whole sketch is O(groups x occupied buckets) rows and
    * every arithmetic step (floor, integer cumsum, one multiply per
    * quantile) is exactly reproducible by another engine; no
    * interpolation, no rank nondeterminism. The reported quantile is the
    * lower bound of the first bucket whose cumulative count reaches
    * ceil(q * n) — error bounded by binWidth, the knob the caller owns.
    *
    * Contrast with percentile_approx: Spark's GK/KLL sketch is
    * implementation-defined, so its results cannot be oracle-checked;
    * this one can, and merges associatively the same way (bucket counts
    * add), which is also what makes it map-side combinable.
    */
  def histQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    binWidth: Double,
                    quantiles: Seq[(String, Double)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = df
      .groupBy(groupCols.map(col) :+
        floor(col(valueCol) / binWidth).cast("long").as("_b"): _*)
      .agg(count(lit(1)).as("_c"))
    val cumW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("_cum", sum(col("_c")).over(cumW))
      .withColumn("_total", sum(col("_c")).over(totW))
    cum.groupBy(groupCols.map(col): _*)
      .agg(quantileCol(quantiles.head, binWidth),
        quantiles.tail.map(q => quantileCol(q, binWidth)): _*)
  }

  private def quantileCol(q: (String, Double), binWidth: Double): Column =
    (min(when(col("_cum") >= ceil(lit(q._2) * col("_total")), col("_b")))
      * binWidth).as(q._1)
}
