package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-trigger HLL estimate row. */
case class HllEstimate(group: String, hll_estimate: Double)

/** One Count-Min counter cell: `cms_count` items hashed into bucket
  * `bucket` of sketch row `row` so far.
  */
case class CmsCounter(row: Int, bucket: Long, cms_count: Long)

/** One histogram cell: `hist_count` values of `group` have landed in
  * fixed-width bucket `bucket` so far.
  */
case class HistCell(group: String, bucket: Long, hist_count: Long)

/** Streaming forms of the portable sketches (graft.operators.Sketches).
  * The property that makes HLL stream-able is register mergeability:
  * max-of-registers over any partition of the input equals the registers
  * of the whole input, so per-micro-batch updates into mapGroupsWithState
  * state converge to EXACTLY the batch answer — asserted in StreamingSpec
  * by comparing against Sketches.hllDistinct on the unioned input.
  */
object StreamSketches {

  private val m = 256

  /** Identical estimate math to Sketches.hllDistinct, on merged registers
    * (registers hold rho in 1..25; 0 = never touched).
    */
  private[streaming] def estimate(regs: Array[Int]): Double = {
    val alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    // powers of two >= 2^-25: the fold is exact in any order
    val sp = regs.map(r => math.pow(2.0, -r)).sum
    val zeros = regs.count(_ == 0)
    val raw = alpha * m.toDouble * m / sp
    val est =
      if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
      else raw
    BigDecimal(est).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Streaming per-group distinct-count estimate: 256 bytes of register
    * state per group in mapGroupsWithState, updated with a max per
    * micro-batch; each trigger re-emits the group's current estimate
    * (update mode). The register extraction reuses the exact column
    * expressions of the batch operator, so batch and stream agree
    * bit-for-bit on any prefix of the input.
    */
  def hllDistinctStream(events: DataFrame, groupCol: String,
                        valueCol: String): Dataset[HllEstimate] = {
    val sp = events.sparkSession
    import sp.implicits._
    val h = md5(col(valueCol).cast("string"))
    val rest = conv(substring(h, 3, 6), 16, 10).cast("long")
    val prepped = events.select(
      col(groupCol).cast("string").as("g"),
      conv(substring(h, 1, 2), 16, 10).cast("int").as("idx"),
      when(rest === 0, lit(25))
        .otherwise(lit(25) - length(bin(rest))).cast("int").as("rho"))
      .as[(String, Int, Int)]
    prepped.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Int, Int)],
         state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(Array.fill(m)(0))
          rows.foreach { case (_, idx, rho) =>
            if (rho > regs(idx)) regs(idx) = rho
          }
          state.update(regs)
          HllEstimate(g, estimate(regs))
      }
  }

  /** Streaming Count-Min sketch: the heavy-hitter counter matrix
    * maintained incrementally. Each event increments `depth` counters
    * (one per sketch row, bucket = the same salted md5 the batch
    * `Sketches.cmsTopK` uses); state is ONE Long per touched
    * (row, bucket) cell in mapGroupsWithState, updated with a sum per
    * micro-batch. Counter addition is order-independent and
    * associative — the dual of HLL's max-mergeable registers — so any
    * micro-batch partition of the stream converges to EXACTLY the batch
    * counters (StreamingSpec asserts cell-for-cell equality against a
    * batch build of the same matrix on the unioned input).
    *
    * Scale: total state is bounded by d*w cells no matter how long the
    * stream runs — the whole point of sketching the stream — and the
    * per-batch shuffle carries only (row, bucket) pairs, partially
    * counted map-side by groupByKey's sort-based aggregation. The
    * heavy-hitter read-out (min over a value's d counters, top-k) is a
    * per-trigger batch query over these <= 1024 rows, e.g. in
    * foreachBatch, and costs nothing at any corpus size.
    */
  def cmsStream(events: DataFrame, valueCol: String,
                depth: Int = 4, width: Int = 256): Dataset[CmsCounter] = {
    val sp = events.sparkSession
    import sp.implicits._
    def bucket(row: Int, v: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(lit(row.toString), lit(":"),
        v.cast("string"))), 1, 7), 16, 10).cast("long"), lit(width))
    val prepped = events.select(posexplode(array((0 until depth).map { r =>
      struct(lit(r).as("row"), bucket(r, col(valueCol)).as("bucket"))
    }: _*)).as(Seq("_pos", "_cell")))
      .select(col("_cell.row"), col("_cell.bucket"))
      .as[(Int, Long)]
    prepped.groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (cell: (Int, Long), rows: Iterator[(Int, Long)],
         state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          CmsCounter(cell._1, cell._2, n)
      }
  }

  /** Streaming histogram sketch: the fixed-width bucket counts behind
    * `Sketches.histQuantiles`, maintained incrementally — one Long of
    * state per touched (group, floor(value/binWidth)) cell, summed per
    * micro-batch. Same mergeability argument as [[cmsStream]] (bucket
    * counts add associatively), so the streamed matrix equals the batch
    * histogram on any prefix of the input, and the quantile read-out
    * (first bucket whose cumulative count reaches ceil(q*n)) is a
    * per-trigger batch pass over O(groups x occupied buckets) rows.
    * State is bounded by the value range / binWidth, the caller's
    * accuracy knob — the stream never holds raw values.
    */
  def histStream(events: DataFrame, groupCol: String, valueCol: String,
                 binWidth: Double): Dataset[HistCell] = {
    val sp = events.sparkSession
    import sp.implicits._
    val prepped = events.where(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        floor(col(valueCol).cast("double") / binWidth).as("b"))
      .as[(String, Long)]
    prepped.groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (cell: (String, Long), rows: Iterator[(String, Long)],
         state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          HistCell(cell._1, cell._2, n)
      }
  }

  /** Streaming top-k candidates via sharded space-saving (Metwally et
    * al. 2005): each value hashes to one of `shards` summaries, and each
    * summary keeps at most `capacity` (value, count, err) entries — on
    * overflow the minimum-count entry is evicted and the newcomer
    * inherits its count as both start and error bound. Because a value
    * always lands in the SAME shard, shard summaries partition the key
    * space (no cross-shard double counting) and their union is a valid
    * candidate set: any value whose true count exceeds its shard's
    * total / capacity is guaranteed present, and a present value's true
    * count lies in [ss_count - ss_err, ss_count].
    *
    * The space-saving family completes the streaming sketch set (HLL =
    * max-merge, CMS/histogram = sum-merge): its state is NOT
    * order-independent — an eviction depends on arrival order — so
    * unlike e12/e13 the stream equals batch only when capacity covers
    * the shard's distinct values (err 0 everywhere, asserted in
    * StreamingSpec along with the eviction-mode bounds).
    *
    * Scale: state is shards x capacity entries forever, the caller's
    * memory knob; per micro-batch only (shard, value) rows shuffle, and
    * the per-trigger read-out (merge shard lists, take global top-k by
    * count) is a batch pass over <= shards*capacity rows. `shards`
    * also bounds update parallelism — size it like a shuffle partition
    * count, not at 1.
    */
  def spaceSavingStream(events: DataFrame, valueCol: String,
                        capacity: Int, shards: Int = 16)
    : Dataset[TopKCand] = {
    val sp = events.sparkSession
    import sp.implicits._
    // md5-derived shard (not xxhash64/murmur): the DuckDB oracle replays
    // the identical assignment, same trick as the CMS buckets
    val prepped = events.select(
      pmod(conv(substring(md5(col(valueCol).cast("string")), 1, 7),
        16, 10).cast("long"), lit(shards)).cast("int").as("shard"),
      col(valueCol).cast("string").as("v"))
      .as[(Int, String)]
    prepped.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[(Int, String)],
         state: GroupState[Map[String, (Long, Long)]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, (Long, Long)])
          rows.foreach { case (_, v) =>
            m.get(v) match {
              case Some((c, e)) => m = m.updated(v, (c + 1, e))
              case None if m.size < capacity => m += v -> (1L, 0L)
              case None =>
                // evict the min-count entry (ties: lexicographic value,
                // so replay within a batch is deterministic)
                val (evictV, (evictC, _)) = m.minBy { case (k, (c, _)) =>
                  (c, k)
                }
                m = (m - evictV) + (v -> (evictC + 1, evictC))
            }
          }
          state.update(m)
          m.iterator.map { case (v, (c, e)) => TopKCand(shard, v, c, e) }
      }
  }
}

/** One sharded space-saving candidate: true count of `value` is within
  * [ss_count - ss_err, ss_count].
  */
case class TopKCand(shard: Int, value: String, ss_count: Long, ss_err: Long)
