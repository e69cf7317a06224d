package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Per-trigger HLL estimate row. */
case class HllEstimate(group: String, hll_estimate: Double)

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
}
