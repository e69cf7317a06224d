package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics — batch and Structured Streaming variants share
  * the same semantics; the batch forms are oracle-checkable, the streaming
  * forms add watermarks/state.
  */
object Events {

  /** Tumbling-window aggregation (batch form, date_trunc semantics equal a
    * 1-unit tumbling window).
    */
  def tumblingAgg(events: DataFrame, unit: String = "hour"): DataFrame =
    events
      .groupBy(date_trunc(unit, col("ts")).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Streaming tumbling-window aggregation with watermark. */
  def tumblingAggStream(events: DataFrame, window: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))

  /** Gap-based sessionization (batch): a new session starts when the gap to
    * the previous event of the same user exceeds `gapMinutes`. Output: one
    * row per session with start/end, event count and value sum.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // integer microseconds: exact, and reproducible in the SQL oracle
    // (epoch_us), unlike whole-second unix_timestamp truncation
    val gap = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(byUser))
    val newSession =
      when(gap.isNull || gap > gapMinutes * 60000000L, 1).otherwise(0)
    val sessionIdx = sum(newSession).over(
      Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    events
      .withColumn("session_idx", sessionIdx)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Streaming dedup by event_id within the watermark. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
