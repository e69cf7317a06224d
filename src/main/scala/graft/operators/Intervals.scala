package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-set algebra (bedtools merge/subtract): the remaining two
  * primitives of the interval toolkit next to the join family
  * (IntervalJoin) and the depth sweep (Coverage). Coordinates are
  * 1-based inclusive throughout (Bed.toIntervals' output convention).
  *
  * Scale: [[merge]] is ONE (keys) exchange + a partition-local sorted
  * window + an aggregation on the same key prefix (no second shuffle);
  * [[subtract]] bounds its work with the binned overlap join — an A
  * interval only ever meets the B intervals sharing its bins — and the
  * complement walk is a per-A-row window over those few clipped pieces.
  * Per-chromosome parallelism, the documented sweep contract.
  */
object Intervals {

  /** bedtools merge: collapse overlapping or near-adjacent intervals
    * into maximal union intervals per key. `maxGap = 0` merges
    * overlapping AND bookended intervals (end+1 == start, bedtools -d 0
    * in 1-based inclusive terms); larger values bridge gaps up to that
    * many bases. Output: keys, merged_start, merged_end, n_intervals.
    */
  def merge(intervals: DataFrame, keys: Seq[String] = Seq("chrom"),
            maxGap: Long = 0L): DataFrame = {
    require(maxGap >= 0, "merge: maxGap must be >= 0")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("start"), col("end"))
    val prevMax = max(col("end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(prevMax.isNull ||
      col("start") > prevMax + 1 + maxGap, 1L).otherwise(0L)
    intervals
      .withColumn("_island", sum(newIsland)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(kc :+ col("_island"): _*)
      .agg(min(col("start")).as("merged_start"),
        max(col("end")).as("merged_end"),
        count(lit(1)).as("n_intervals"))
      .drop("_island")
  }

  /** bedtools subtract: the parts of every A interval NOT covered by
    * any B interval. `aIdCols` identifies A rows (coordinates alone may
    * repeat); B is union-merged first so clipped hits are disjoint and
    * the complement walk is a simple sorted gap scan per A row:
    * leading gap, between-hit gaps (lag window), trailing gap, and
    * untouched A rows pass through whole. Output: keys, aIdCols,
    * start/end of each surviving sub-interval.
    */
  def subtract(a: DataFrame, b: DataFrame,
               keys: Seq[String] = Seq("chrom"),
               aIdCols: Seq[String] = Seq("id"),
               binSize: Long = 10000L): DataFrame = {
    val kc = keys.map(col)
    val idc = aIdCols.map(col)
    val aKey = kc ++ idc ++ Seq(col("start"), col("end"))
    val bm = merge(b, keys)
      .select(kc :+ col("merged_start").as("start2") :+
        col("merged_end").as("end2"): _*)
    val hits = IntervalJoin.overlapJoin(a, bm, keys, binSize)
      .select(aKey :+
        greatest(col("start"), col("start2")).as("_cs") :+
        least(col("end"), col("end2")).as("_ce"): _*)
    val w = Window.partitionBy(aKey: _*).orderBy(col("_cs"))
    // gap before each hit: [start | prev_ce+1, cs-1]
    val gaps = hits
      .withColumn("_from",
        coalesce(lag(col("_ce"), 1).over(w) + 1, col("start")))
      .where(col("_from") <= col("_cs") - 1)
      .select(kc ++ idc :+ col("_from").as("out_start") :+
        (col("_cs") - 1).as("out_end"): _*)
    // gap after the last hit: [max_ce+1, end]
    val tails = hits
      .groupBy(aKey: _*)
      .agg(max(col("_ce")).as("_m"))
      .where(col("_m") < col("end"))
      .select(kc ++ idc :+ (col("_m") + 1).as("out_start") :+
        col("end").as("out_end"): _*)
    // A rows with no overlapping B at all survive whole (anti-join on
    // the FULL row identity incl. coordinates — id columns alone could
    // suppress a hit-less sibling interval of the same id)
    val untouched = a.join(
      hits.select(aKey: _*).distinct(),
      keys ++ aIdCols ++ Seq("start", "end"), "left_anti")
      .select(kc ++ idc :+ col("start").as("out_start") :+
        col("end").as("out_end"): _*)
    gaps.unionByName(tails).unionByName(untouched)
      .withColumnRenamed("out_start", "start")
      .withColumnRenamed("out_end", "end")
  }
}
