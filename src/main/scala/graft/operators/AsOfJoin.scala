package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for every left row, attach the payload of the
  * latest right row whose timestamp is <= (or strictly < with
  * `allowExact = false`) the left row's timestamp, matched on an equality
  * key — the canonical "most recent quote for each trade" operator.
  *
  * Spark-first plan: instead of a range-condition join (which Catalyst
  * executes as an equi-join on the key with a per-key cross product —
  * quadratic in per-key row counts and a skew trap at 100 TB), both sides
  * are union'd with a side tag and processed with ONE window over
  * (key ORDER BY ts, side): `last(payload, ignoreNulls)` up to the current
  * row fills each left row with the most recent right payload. Cost: a
  * single hash shuffle on the key + an in-partition sort — linear in
  * |left| + |right|, no fan-out. (A hot key still lands on one window
  * partition — AQE's skew splitting applies to joins, not window
  * exchanges — but the per-row state is a single running `last`, so a
  * hot key costs linear time, not the range-join plan's fan-out.)
  *
  * Right rows that share (key, ts) resolve deterministically through the
  * tie-break column: backward picks the MAX tie-break (latest-looking
  * duplicate), forward the MIN (earliest-looking) — mirroring each
  * direction's "nearest in walk order" semantics.
  */
object AsOfJoin {

  /** @param payload right-side columns to carry onto left rows (must not
    *                clash with left column names)
    * @param rightTieBreak right column ordering duplicates within
    *                (key, ts); backward keeps the max row, forward the min
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, payload: Seq[String],
                   rightTieBreak: String,
                   allowExact: Boolean = true): DataFrame =
    asof(left, right, key, leftTs, rightTs, payload, rightTieBreak,
      allowExact, forward = false)

  /** Forward as-of: the EARLIEST right row at-or-after (or strictly
    * after) each left row — "next event" attribution. Same one-shuffle
    * union+window plan walked in descending time order; duplicate right
    * rows within (key, ts) resolve to the LOWEST tie-break.
    */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, payload: Seq[String],
                  rightTieBreak: String,
                  allowExact: Boolean = true): DataFrame =
    asof(left, right, key, leftTs, rightTs, payload, rightTieBreak,
      allowExact, forward = true)

  /** Nearest as-of: each left row attaches the right row with the
    * smallest |rightTs − leftTs| in either direction (`bedtools
    * closest` in time; pandas `merge_asof(direction='nearest')`).
    * Equidistant candidates — including exact-ts matches — resolve to
    * the BACKWARD side, whose (key, ts) duplicates resolve to the max
    * tie-break as in [[asofBackward]]; forward duplicates to the min.
    *
    * Plan: the same union+side-tag frame evaluated under BOTH walk
    * directions as two window functions over ONE partitioning — Spark
    * plans a single hash exchange on the key with two in-partition
    * sorts (asc, desc), so the cost over a one-direction as-of is one
    * extra sort, not a shuffle. The winner pick is per-row column
    * arithmetic on the two candidate structs (each carries its matched
    * ts), nothing re-crosses the wire.
    */
  def asofNearest(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, payload: Seq[String],
                  rightTieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    // the equidistant tie must be decided EXACTLY (an equidistant pair
    // off by one double ulp would flip the winner vs an integer-interval
    // engine): timestamps compare in integral microseconds, integral ts
    // stay integral; only a genuinely fractional numeric ts rides double
    def num(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case _: org.apache.spark.sql.types.TimestampType => unix_micros(c)
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(c.cast("timestamp"))
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType => c.cast("long")
        case _ => c.cast("double")
      }
    val rTagged = right.select(
      col(key) +: col(rightTs).as("_ts") +: lit(0).as("_side") +:
        col(rightTieBreak).as("_tie") +:
        struct(payload.map(col) :+
          num(col(rightTs), right.schema(rightTs).dataType).as("_rts"):
          _*).as("_pay") +:
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val lTagged = left.select(
      col(key) +: col(leftTs).as("_ts") +: lit(1).as("_side") +:
        lit(null).as("_tie") +:
        lit(null).cast(rTagged.schema("_pay").dataType).as("_pay") +:
        leftCols.filterNot(_ == key).map(col): _*)
    val wB = Window.partitionBy(col(key))
      .orderBy(col("_ts").asc, col("_side").asc,
        col("_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(col(key))
      .orderBy(col("_ts").desc, col("_side").asc,
        col("_tie").desc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rTagged.unionByName(lTagged)
      .select(col(key) +: col("_ts") +: col("_side") +:
        last(col("_pay"), ignoreNulls = true).over(wB).as("_payB") +:
        last(col("_pay"), ignoreNulls = true).over(wF).as("_payF") +:
        leftCols.filterNot(_ == key).map(col): _*)
    val lNum = num(col("_ts"), left.schema(leftTs).dataType)
    val distB = lNum - col("_payB._rts")
    val distF = col("_payF._rts") - lNum
    val nearest = when(col("_payB").isNull, col("_payF"))
      .when(col("_payF").isNull, col("_payB"))
      .when(distB <= distF, col("_payB"))
      .otherwise(col("_payF"))
    filled.where(col("_side") === 1)
      .withColumn("_win", nearest)
      .select(leftCols.map {
        case c if c == leftTs => col("_ts").as(leftTs)
        case c => col(c)
      } ++ payload.map(c => col(s"_win.$c").as(c)): _*)
  }

  private def asof(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, payload: Seq[String],
                   rightTieBreak: String, allowExact: Boolean,
                   forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    // side ordering at equal ts: right sorts before left iff ties match.
    // Duplicate right rows within (key, ts) need no pre-dedup pass (that
    // would cost a second exchange): ordering the ONE window by the
    // tie-break makes the max row the last one `last()` sees.
    val rSide = if (allowExact) 0 else 2
    // the payload travels as ONE struct, so `last(ignoreNulls)` picks all
    // fields from the SAME right row — per-column lasts would stitch
    // fields from different rows whenever a payload value is NULL
    val rTagged = right.select(
      col(key) +: col(rightTs).as("_ts") +: lit(rSide).as("_side") +:
        col(rightTieBreak).as("_tie") +:
        struct(payload.map(col): _*).as("_pay") +:
        leftCols.filterNot(_ == key).map(c => lit(null).as(c)): _*)
    val lTagged = left.select(
      col(key) +: col(leftTs).as("_ts") +: lit(1).as("_side") +:
        lit(null).as("_tie") +:
        lit(null).cast(rTagged.schema("_pay").dataType).as("_pay") +:
        leftCols.filterNot(_ == key).map(col): _*)
    // backward walks time ascending (last-seen = latest <= left);
    // forward walks descending (last-seen = earliest >= left). The tie
    // column inverts with direction so "last seen" is the max tie-break
    // going backward and the min going forward.
    val w = Window.partitionBy(col(key))
      .orderBy(
        (if (forward) col("_ts").desc else col("_ts").asc) +:
          col("_side").asc +:
          Seq(if (forward) col("_tie").desc_nulls_first
          else col("_tie").asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rTagged.unionByName(lTagged)
      .select(col(key) +: col("_ts") +: col("_side") +:
        last(col("_pay"), ignoreNulls = true).over(w).as("_pay") +:
        leftCols.filterNot(_ == key).map(col): _*)
    filled.where(col("_side") === 1)
      .select(leftCols.map {
        case c if c == leftTs => col("_ts").as(leftTs)
        case c => col(c)
      } ++ payload.map(c => col(s"_pay.$c").as(c)): _*)
  }
}
