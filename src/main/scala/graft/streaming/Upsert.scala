package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Latest-change state for one key (its materialized row). */
case class UpsertState(seq: Long, op: String, value: Double)

/** Per-trigger emission: the key's current materialized row. */
case class UpsertOut(key: Long, seq: Long, op: String, value: Double)

/** Streaming CDC upsert materialization — the streaming form of u3/u5
  * (`TableOps.applyChangelog`): a changelog of keyed I/U/D changes is
  * folded into an always-current snapshot, one micro-batch at a time.
  *
  * State is ONE row per key — exactly the snapshot a materialized view
  * holds, the floor for any upsert sink (this is what Delta/Hudi/Paimon
  * keep as their merge baseline). Each trigger emits the touched keys'
  * current rows ('D' rows surface as tombstones so a downstream sink can
  * delete); untouched keys emit nothing, so per-trigger output is
  * proportional to the batch, not the table.
  *
  * Correctness property (the reason max-by-seq lives in the state fold
  * rather than "last write wins"): CDC arrives out of order across
  * triggers, and a LATE change with a LOWER sequence number must lose to
  * the higher-seq row already applied — state keeps the max-(seq, op,
  * value) struct, the same lexicographic contract as the batch
  * compaction, so stream == batch on any input split whenever seq is
  * unique per key (the u5 LSN contract). StreamingSpec pins both the
  * split-equality and the late-low-seq case.
  */
object Upsert {

  /** `changes` needs (keyCol: long, seqCol: long, opCol: string,
    * valueCol: double); runs identically on a batch frame (one
    * micro-batch — the gate form) and a readStream.
    */
  def upsertStream(changes: DataFrame, keyCol: String, seqCol: String,
                   opCol: String, valueCol: String): Dataset[UpsertOut] = {
    val sp = changes.sparkSession
    import sp.implicits._
    changes
      .select(col(keyCol).cast("long"), col(seqCol).cast("long"),
        col(opCol).cast("string"), col(valueCol).cast("double"))
      .as[(Long, Long, String, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: Long, rows: Iterator[(Long, Long, String, Double)],
         state: GroupState[UpsertState]) =>
          // same ordering as max(struct(seq, op, value)) in the batch
          // compaction: seq first, then op/value as tie arms (seq is
          // unique per key under the CDC-LSN contract, so the tie arms
          // never decide between real changes)
          var best = state.getOption.orNull
          rows.foreach { case (_, seq, op, value) =>
            if (best == null || seq > best.seq ||
              (seq == best.seq && (op > best.op ||
                (op == best.op && value > best.value))))
              best = UpsertState(seq, op, value)
          }
          state.update(best)
          UpsertOut(key, best.seq, best.op, best.value)
      }
  }
}
