package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval pileup depth (bedtools genomecov): how many intervals cover
  * each base, reported as maximal constant-depth segments — the sweep
  * line as a relational plan. Intervals become +1/-1 boundary events,
  * same-position deltas pre-aggregate map-side, and ONE per-key window
  * pass computes the running depth and each segment's extent. No
  * per-base explode ever happens: a 100 kb exon is two events, so the
  * shuffled row count is 2x the interval count regardless of genome
  * size.
  *
  * Scale note: the window partitions by the chromosome key, so
  * parallelism is per-chromosome (the as-of join's documented contract).
  * If one contig dominates, split it with a derived sub-key and stitch
  * the boundary segment — the standard two-pass prefix-sum refinement;
  * not needed at the fixture scales this gates on.
  */
object Coverage {

  /** `intervals` carries `keys` + 1-based inclusive [start, end]. Output:
    * (keys, seg_start, seg_end, depth) for every maximal depth>0 run.
    */
  def coverage(intervals: DataFrame,
               keys: Seq[String] = Seq("chrom")): DataFrame = {
    require(keys.nonEmpty, "coverage needs a partition key " +
      "(e.g. the chromosome): the sweep orders positions within it")
    val kc = keys.map(col)
    val events = intervals
      .select(kc :+ col("start").as("pos") :+ lit(1L).as("delta"): _*)
      .unionAll(intervals.select(
        kc :+ (col("end") + 1).as("pos") :+ lit(-1L).as("delta"): _*))
    val merged = events.groupBy(kc :+ col("pos"): _*)
      .agg(sum(col("delta")).as("d"))
      // a net-zero breakpoint (one interval ends where another starts)
      // never changes depth — dropping it keeps segments MAXIMAL
      // (PropertySpec asserts adjacent segments differ in depth)
      .where(col("d") =!= 0)
    val w = Window.partitionBy(kc: _*).orderBy(col("pos"))
    merged
      .withColumn("depth", sum(col("d")).over(w))
      .withColumn("_next", lead(col("pos"), 1).over(w))
      .where(col("depth") > 0 && col("_next").isNotNull)
      .select(kc :+ col("pos").as("seg_start") :+
        (col("_next") - 1).as("seg_end") :+ col("depth"): _*)
  }

  /** bedtools `genomecov -hist`-style depth histogram over [[coverage]]
    * segments: bases at each depth per key. Segments are already the
    * run-length-compressed form, so the histogram is one tiny aggregation
    * of (seg_end - seg_start + 1) weights — no base explode; the
    * exchange carries one row per (key, distinct depth).
    */
  def depthHistogram(segments: DataFrame,
                     keys: Seq[String] = Seq("chrom")): DataFrame = {
    val kc = keys.map(col)
    segments.groupBy(kc :+ col("depth"): _*)
      .agg(sum(col("seg_end") - col("seg_start") + 1).as("n_bases"))
  }

  /** bedtools `coverage`-style target breadth: for every target interval
    * (`start2`/`end2` + `targetIdCols`), how many of its bases at least
    * one read covers, and the covered fraction. Composition of the two
    * scalable primitives: g4's binned overlap join finds read x target
    * hits (bounded candidates, bin-ownership exact), the clipped hits
    * run [[coverage]]'s event sweep KEYED BY TARGET (union length
    * without double-counting overlapping reads — parallelism is
    * per-target, which is exactly the key cardinality that grows with
    * the data), and targets with no reads come back via one left join
    * with breadth 0.
    */
  def targetBreadth(reads: DataFrame, targets: DataFrame,
                    partitionKeys: Seq[String] = Seq("chrom"),
                    targetIdCols: Seq[String] = Seq("transcript_id"),
                    binSize: Long = 10000L): DataFrame = {
    val tKeys = partitionKeys ++ targetIdCols ++ Seq("start2", "end2")
    val clipped = IntervalJoin
      .overlapJoin(reads, targets, partitionKeys, binSize)
      .select(tKeys.map(col) :+
        greatest(col("start"), col("start2")).as("_cs") :+
        least(col("end"), col("end2")).as("_ce"): _*)
    val covered = coverage(
      clipped.select(tKeys.map(col) :+ col("_cs").as("start") :+
        col("_ce").as("end"): _*), tKeys)
      .groupBy(tKeys.map(col): _*)
      .agg(sum(col("seg_end") - col("seg_start") + 1).as("covered_bases"))
    targets.join(covered, tKeys, "left")
      .withColumn("covered_bases", coalesce(col("covered_bases"), lit(0L)))
      .withColumn("breadth",
        round(col("covered_bases").cast("double") /
          (col("end2") - col("start2") + 1), 5))
  }
}
