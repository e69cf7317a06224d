package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Genomic interval join: points (variants) x intervals (exons/transcripts).
  *
  * Reference does a single-threaded sorted sweep-line over one chromosome
  * (/root/reference/src/modules/vcf_reader.py:79-125). That cannot scale to
  * a 100 TB VCF; instead both sides are mapped to fixed-width genomic bins,
  * turning the range predicate into an equi-join (+ residual filter) that
  * Spark executes as a shuffled/broadcast hash join with AQE. Intervals
  * explode to every bin they overlap (fanout = interval_len / binSize + 1,
  * small for exon-sized intervals), points map to exactly one bin, so the
  * candidate set per bin is tiny and the join never materializes a cross
  * product.
  */
object IntervalJoin {

  /** Inner-join `points` to `intervals` where
    * interval.start <= point.pos <= interval.end, matching on `partitionKey`
    * (e.g. chromosome) when present on both sides.
    *
    * Column name requirements: points has `pos`; intervals has `start`,
    * `end`. All other columns pass through.
    */
  def pointsInIntervals(points: DataFrame, intervals: DataFrame,
                        partitionKeys: Seq[String],
                        binSize: Long = 10000L): DataFrame = {
    require(partitionKeys.nonEmpty,
      "pointsInIntervals needs a partition key (e.g. the chromosome): " +
        "bin ids collide across chromosomes and the residual filter only " +
        "checks pos within [start,end]")
    partitionKeys.foreach { k =>
      require(points.columns.contains(k) && intervals.columns.contains(k),
        s"partition key '$k' must exist on both sides")
    }
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(floor(col("start") / binSize),
        floor(col("end") / binSize))))
    val binnedPoints = points.withColumn("_bin", floor(col("pos") / binSize))
    val keys = "_bin" +: partitionKeys
    binnedPoints
      .join(binnedIntervals, keys,
        "inner")
      .where(col("pos") >= col("start") && col("pos") <= col("end"))
      .drop("_bin")
  }

  /** Interval x interval OVERLAP join (s1 <= e2 AND s2 <= e1), same
    * binning idea with both sides exploded. A pair overlapping n shared
    * bins would surface n times from the equi-join; instead of a distinct
    * (an extra full shuffle of the output), each pair is emitted ONLY by
    * the bin that owns the overlap's left edge — `floor(max(start1,
    * start2) / binSize)` — the standard dedup-free ownership trick, so
    * the join output is exact without any post-shuffle.
    *
    * Left columns `start`/`end`, right columns `start2`/`end2`; all other
    * columns pass through.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  partitionKeys: Seq[String],
                  binSize: Long = 10000L): DataFrame = {
    require(partitionKeys.nonEmpty,
      "overlapJoin needs a partition key (e.g. the chromosome)")
    partitionKeys.foreach { k =>
      require(left.columns.contains(k) && right.columns.contains(k),
        s"partition key '$k' must exist on both sides")
    }
    val l = left.withColumn("_bin",
      explode(sequence(floor(col("start") / binSize),
        floor(col("end") / binSize))))
    val r = right.withColumn("_bin",
      explode(sequence(floor(col("start2") / binSize),
        floor(col("end2") / binSize))))
    val keys = "_bin" +: partitionKeys
    l.join(r, keys, "inner")
      .where(col("start") <= col("end2") && col("start2") <= col("end") &&
        col("_bin") === floor(greatest(col("start"), col("start2")) / binSize))
      .drop("_bin")
  }

  /** Nearest-interval join (`bedtools closest -d` with a bounded search
    * radius): each point reports its closest interval on the same
    * partition key within `radius` — distance 0 inside [start, end],
    * otherwise the gap to the nearer edge; ties resolve to the smallest
    * `idCol`. Points with no interval inside the radius emit nothing;
    * the radius is the caller's honesty knob (an UNBOUNDED closest needs
    * escalating re-scans — a driver loop — and "closest gene within 1 Mb"
    * is what annotation pipelines actually ask).
    *
    * Plan: intervals explode to their covering bins (pointsInIntervals'
    * binning); points explode to the bins covering [pos-radius,
    * pos+radius] (fanout 2*radius/binSize + 1). A candidate pair shares
    * up to that many bins, so it is CLAIMED only by the bin owning the
    * interval's nearest coordinate to the point (pos clamped into
    * [start, end]) — exact output with no distinct — and the per-point
    * winner is ONE partial-aggregated min(struct(distance, id)): no
    * window, no second shuffle of the candidate set.
    */
  def nearestInterval(points: DataFrame, intervals: DataFrame,
                      idCol: String, partitionKeys: Seq[String],
                      radius: Long, binSize: Long = 10000L): DataFrame = {
    require(partitionKeys.nonEmpty,
      "nearestInterval needs a partition key (e.g. the chromosome)")
    partitionKeys.foreach { k =>
      require(points.columns.contains(k) && intervals.columns.contains(k),
        s"partition key '$k' must exist on both sides")
    }
    require(radius > 0 && binSize > 0, "radius and binSize must be > 0")
    // The join expressions below hard-bind pos to the points side and
    // start/end to the intervals side; a points frame carrying start/end
    // (interval-vs-interval callers) would make them ambiguous or bind
    // to the wrong side silently.
    require(points.columns.contains("pos"),
      "nearestInterval: points needs a 'pos' column")
    Seq("start", "end").foreach { c =>
      require(intervals.columns.contains(c),
        s"nearestInterval: intervals needs a '$c' column")
      require(!points.columns.contains(c),
        s"nearestInterval: points must not carry '$c' (it would bind " +
          "ambiguously against the intervals side — rename it, or for " +
          "interval-vs-interval nearest use the interval midpoint as pos)")
    }
    require(!intervals.columns.contains("pos"),
      "nearestInterval: intervals must not carry 'pos'")
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(floor(col("start") / binSize),
        floor(col("end") / binSize))))
    val binnedPoints = points.withColumn("_bin",
      explode(sequence(floor((col("pos") - radius) / binSize),
        floor((col("pos") + radius) / binSize))))
    val keys = "_bin" +: partitionKeys
    val nearestCoord = least(greatest(col("pos"), col("start")), col("end"))
    val dist = greatest(col("start") - col("pos"),
      col("pos") - col("end"), lit(0L)).cast("long")
    val ptCols = points.columns.map(col)
    binnedPoints.join(binnedIntervals, keys, "inner")
      .where(dist <= radius &&
        col("_bin") === floor(nearestCoord / binSize))
      .select(ptCols :+ dist.as("_d") :+ col(idCol).as("_iv"): _*)
      .groupBy(ptCols: _*)
      .agg(min(struct(col("_d"), col("_iv"))).as("_m"))
      .select(ptCols :+ col("_m._d").as("distance") :+
        col("_m._iv").as(idCol): _*)
  }
}
