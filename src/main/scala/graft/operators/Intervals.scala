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

  /** bedtools cluster: assign every input interval its overlap-cluster
    * label without collapsing rows — the grouping step consumers join
    * on (peak families, CNV region grouping) where [[merge]] would lose
    * the members. Same island walk and same ONE-exchange contract as
    * [[merge]]; `maxGap` as there. Divergence from bedtools: cluster
    * ids are stable per-key labels `key:island` rather than global
    * input-order ordinals — a global counter is a single-partition
    * sequence at scale, and the label carries the same grouping
    * information. Duplicate intervals keep one row each, same label
    * (the island cumsum is tie-order-proof: equal (start, end) rows can
    * never straddle an island boundary). The label is INJECTIVE in the
    * key tuple: '\' then ':' are escaped inside each key value before
    * the ':' join (island is numeric, never escaped), so multi-column
    * keys or ':'-bearing values (e.g. `HLA-A:01`) can't collide into
    * one cluster_id. A null key renders as the sentinel `\0`
    * (backslash-zero) AFTER escaping, which no real value can produce
    * (every real backslash doubles) — without it `concat_ws` silently
    * drops nulls and (null,"a")/("a",null) would collide.
    */
  def cluster(intervals: DataFrame, keys: Seq[String] = Seq("chrom"),
              maxGap: Long = 0L): DataFrame = {
    require(maxGap >= 0, "cluster: maxGap must be >= 0")
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*).orderBy(col("start"), col("end"))
    val prevMax = max(col("end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val newIsland = when(prevMax.isNull ||
      col("start") > prevMax + 1 + maxGap, 1L).otherwise(0L)
    intervals
      .withColumn("_island", sum(newIsland)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cluster_id",
        concat_ws(":", kc.map(c =>
          coalesce(regexp_replace(regexp_replace(c.cast("string"),
            lit("\\\\"), lit("\\\\\\\\")), lit(":"), lit("\\\\:")),
            lit("\\0")))
          :+ col("_island"): _*))
      .drop("_island")
  }

  /** bedtools slop: widen every interval by `left`/`right` bases,
    * clipped to the chromosome bounds — the flanking-context step
    * before motif scans or g2-family joins. `genome` is the (chrom,
    * length) dictionary (bedtools' -g file); the join is broadcast
    * (a reference dictionary is KBs at any corpus scale), the interval
    * scan never shuffles. Lower bound always clips to 1; the upper
    * bound clips only when the chromosome's length is known —
    * bedtools hard-errors on a chrom missing from -g, but a 100 TB
    * multi-source interval set routinely carries contigs the
    * dictionary lacks, so passing them through un-clipped (documented)
    * beats failing the scan. An interval lying entirely beyond a known
    * chromosome end collapses to the [len, len] boundary stub —
    * bedtools' zero-length clamp expressed in 1-based inclusive terms.
    */
  def slop(intervals: DataFrame, genome: DataFrame,
           left: Long, right: Long): DataFrame = {
    require(left >= 0 && right >= 0, "slop: pads must be >= 0")
    intervals
      .join(broadcast(genome.select(col("chrom"),
        col("length").as("_glen"))), Seq("chrom"), "left")
      .withColumn("start", when(col("_glen").isNotNull,
        least(greatest(col("start") - left, lit(1L)), col("_glen")))
        .otherwise(greatest(col("start") - left, lit(1L))))
      .withColumn("end", when(col("_glen").isNotNull,
        least(col("end") + right, col("_glen")))
        .otherwise(col("end") + right))
      .drop("_glen")
  }

  /** bedtools multiinter: partition each key's axis into the ATOMIC
    * segments between consecutive breakpoints of N labeled interval
    * sets and report, per segment, how many and which sets cover it
    * (segments no set covers are omitted, like bedtools). The
    * common-regions query (`n_sets = N`), the unique-to-one-set query
    * and the combinatorial overlap profile all read straight off the
    * output.
    *
    * Plan: each set union-merges first ([[merge]] keyed (keys, set) —
    * one exchange), so membership is point-in-disjoint-interval;
    * breakpoints (starts ∪ ends+1, distinct) walk to segments with one
    * lead window per key — ENDPOINT-scale, the documented per-chromosome
    * sweep contract (g7) — and segment↔set membership is the binned
    * overlap join (a segment never straddles a merged-interval edge, so
    * overlap == containment), aggregated per segment with a sorted
    * collect_set. No cross-set product anywhere: work is
    * O(endpoints · log + segments · avg-coverage).
    */
  def multiinter(sets: Seq[(String, DataFrame)],
                 keys: Seq[String] = Seq("chrom"),
                 binSize: Long = 10000L): DataFrame = {
    require(sets.nonEmpty, "multiinter needs at least one interval set")
    val kc = keys.map(col)
    val all = sets.map { case (name, df) =>
      df.select(kc :+ lit(name).as("_set") :+ col("start")
        :+ col("end"): _*)
    }.reduce(_ unionByName _)
    val m = merge(all, keys :+ "_set")
      .select(kc :+ col("_set") :+ col("merged_start").as("start2")
        :+ col("merged_end").as("end2"): _*)
    val bp = m.select(kc :+ col("start2").as("pos"): _*)
      .unionByName(m.select(kc :+ (col("end2") + 1).as("pos"): _*))
      .distinct()
    val w = Window.partitionBy(kc: _*).orderBy(col("pos"))
    val segs = bp
      .withColumn("_next", lead(col("pos"), 1).over(w))
      .where(col("_next").isNotNull)
      .select(kc :+ col("pos").as("start")
        :+ (col("_next") - 1).as("end"): _*)
    IntervalJoin.overlapJoin(segs, m, keys, binSize)
      .groupBy(kc :+ col("start") :+ col("end"): _*)
      // per-set merge makes intervals disjoint within a set, so a
      // segment meets each set at most once: plain count == distinct
      // count, without the expand a countDistinct would plan
      .agg(count(lit(1)).as("n_sets"),
        array_join(array_sort(collect_set(col("_set"))), ";").as("sets"))
  }

  /** bedtools complement: the regions of each key's bounded span NOT
    * covered by any interval (intergenic space). `bounds` is the genome
    * table — one row per key: keys, bound_start, bound_end (bedtools'
    * `-g` file). Rides [[merge]]'s single exchange: after merging, the
    * gap walk is a lag window on the SAME key partitioning (no second
    * shuffle), and bounds broadcast (a genome table is tiny — one row
    * per contig — at any corpus scale). Keys present in `bounds` but
    * absent from `intervals` emit their whole span, like bedtools.
    * Output: keys, start, end.
    */
  def complement(intervals: DataFrame, bounds: DataFrame,
                 keys: Seq[String] = Seq("chrom")): DataFrame = {
    val kc = keys.map(col)
    val m = merge(intervals, keys)
      .join(broadcast(bounds), keys)
      // clip to bounds; intervals fully outside the span vanish
      .withColumn("_s", greatest(col("merged_start"), col("bound_start")))
      .withColumn("_e", least(col("merged_end"), col("bound_end")))
      .where(col("_s") <= col("_e"))
    val w = Window.partitionBy(kc: _*).orderBy(col("_s"))
    // gap before each merged island: [bound_start | prev_e+1, s-1]
    val gaps = m
      .withColumn("_from",
        coalesce(lag(col("_e"), 1).over(w) + 1, col("bound_start")))
      .where(col("_from") <= col("_s") - 1)
      .select(kc :+ col("_from").as("start") :+
        (col("_s") - 1).as("end"): _*)
    // gap after the last island: [max_e+1, bound_end]
    val tails = m
      .groupBy(kc: _*)
      .agg(max(col("_e")).as("_m"), first(col("bound_end")).as("_be"))
      .where(col("_m") < col("_be"))
      .select(kc :+ (col("_m") + 1).as("start") :+
        col("_be").as("end"): _*)
    // keys with no intervals at all: the whole bounded span
    val empty = bounds.join(
      intervals.select(kc: _*).distinct(), keys, "left_anti")
      .select(kc :+ col("bound_start").as("start") :+
        col("bound_end").as("end"): _*)
    gaps.unionByName(tails).unionByName(empty)
  }

  /** bedtools jaccard: similarity of two interval SETS — intersection
    * basepairs / union basepairs over the merged forms of each side.
    * Both sides merge first (disjoint islands), so the intersection is
    * a plain overlap join with clipped-length sums and the union is
    * len(A) + len(B) − intersection. Scale: two merge exchanges + the
    * binned overlap join; the result reduces to ONE row (three partial
    * aggregations, no data movement beyond the join).
    * Output: intersection_bp, union_bp, jaccard, n_intersections.
    */
  def jaccard(a: DataFrame, b: DataFrame,
              keys: Seq[String] = Seq("chrom"),
              binSize: Long = 10000L): DataFrame = {
    def merged(df: DataFrame) = merge(df, keys)
      .select(keys.map(col) :+ col("merged_start").as("start") :+
        col("merged_end").as("end"): _*)
    val (ma, mb) = (merged(a), merged(b))
    def totalLen(df: DataFrame, alias: String) =
      df.agg(coalesce(sum(col("end") - col("start") + 1), lit(0L))
        .as(alias))
    val inter = IntervalJoin.overlapJoin(ma,
        mb.withColumnRenamed("start", "start2")
          .withColumnRenamed("end", "end2"), keys, binSize)
      .agg(coalesce(sum(least(col("end"), col("end2")) -
          greatest(col("start"), col("start2")) + 1), lit(0L))
        .as("intersection_bp"),
        count(lit(1)).as("n_intersections"))
    inter.crossJoin(totalLen(ma, "_la")).crossJoin(totalLen(mb, "_lb"))
      .select(col("intersection_bp"),
        (col("_la") + col("_lb") - col("intersection_bp")).as("union_bp"),
        round(col("intersection_bp") /
          (col("_la") + col("_lb") - col("intersection_bp")), 6)
          .as("jaccard"),
        col("n_intersections"))
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
