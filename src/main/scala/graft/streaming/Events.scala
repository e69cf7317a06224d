package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open session accumulator for the stateful streaming sessionizer. */
case class SessionAcc(start: Long, end: Long, n: Long, sum: Double)

/** Emitted (closed) session. */
case class SessionOut(user_id: Long, session_start: Timestamp,
                      session_end: Timestamp, n_events: Long,
                      sum_value: Double)

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

  /** Streaming gap-based sessionization with custom state:
    * flatMapGroupsWithState keeps one open session per user, closes it
    * when an event arrives more than `gapMinutes` after the session end
    * (emitting the closed session immediately) or when the event-time
    * timeout fires after the watermark passes the gap. Same output shape
    * as the batch [[sessionize]].
    */
  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "1 hour"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L

    def close(user: Long, s: SessionAcc): SessionOut =
      SessionOut(user, new Timestamp(s.start), new Timestamp(s.end), s.n,
        s.sum)

    def update(user: Long, rows: Iterator[(Long, Timestamp, Double)],
               state: GroupState[SessionAcc]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = close(user, state.get)
        state.remove()
        Iterator(out)
      } else {
        val sorted = rows.toSeq.sortBy(_._2.getTime)
        var acc = state.getOption
        val closed = Seq.newBuilder[SessionOut]
        sorted.foreach { case (_, t, v) =>
          val ms = t.getTime
          acc match {
            case Some(a) if ms - a.end > gapMs =>
              closed += close(user, a)
              acc = Some(SessionAcc(ms, ms, 1L, v))
            case Some(a) =>
              // min() on start: an in-watermark event from a later
              // micro-batch may be OLDER than the open session's start —
              // batch sessionize would have extended the session backwards,
              // so the stream must too
              acc = Some(SessionAcc(math.min(a.start, ms),
                math.max(a.end, ms), a.n + 1, a.sum + v))
            case None =>
              acc = Some(SessionAcc(ms, ms, 1L, v))
          }
        }
        acc.foreach { a =>
          state.update(a)
          state.setTimeoutTimestamp(a.end + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming dedup by event_id within the watermark. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Deterministic stream sampling (admission control / sampled
    * telemetry): the batch samplers' retry-stable md5 draw as a
    * STATELESS stream predicate — no watermark, no state store, and the
    * kept row set is identical on the live stream, the batch replay,
    * and any micro-batch retry (a rand() filter admits a different set
    * on every retry, breaking exactly-once sinks). The predicate is
    * pure codegen'd row arithmetic sitting on the source scan.
    */
  def sampleEvents(events: DataFrame, rate: Double, salt: String = "",
                   idCol: String = "event_id"): DataFrame = {
    require(rate > 0 && rate <= 1, "sampleEvents: rate must be in (0, 1]")
    events.where(graft.operators.Sampling.hashDraw(col(idCol), salt)
      .cast("double") < lit(rate) * 4294967296.0)
  }

  /** Running table fingerprint on a stream (continuous replication
    * verification — u10's commutative checksum as streaming state):
    * count + two 32-bit XOR folds + one 32-bit sum of the row md5 per
    * group. Every fold is associative-commutative, so the streaming
    * aggregation state IS the partial aggregate — four longs per group
    * forever, updated incrementally each micro-batch; in complete/update
    * mode the emitted row always equals the batch checksum of all rows
    * seen so far (StreamingSpec proves it). Identical call works on a
    * batch frame — e20's oracle checks that form.
    */
  def checksumStream(events: DataFrame, groupCols: Seq[String],
                     cols: Seq[String]): DataFrame =
    graft.operators.TableOps.tableChecksum(events, groupCols, cols)

  /** Stream-static enrichment: attach dimension attributes to each event
    * by key. The dimension is broadcast, so the stream is never shuffled;
    * in streaming form Spark re-resolves the static side per micro-batch
    * (a dimension refresh is picked up without restarting the query).
    * Works identically on a batch DataFrame — e4's oracle checks that
    * form.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Correlate cause events with effect events per key within a bounded
    * horizon: effect.ts in [cause.ts, cause.ts + horizon] — the
    * view->purchase attribution join. The predicate is an equi-join on
    * the key plus a bounded time-range condition, exactly the shape
    * Structured Streaming requires for a watermarked stream-stream inner
    * join (the range bound lets both sides' state expire); the same call
    * works on batch frames, which is what e5's oracle checks. On a
    * stream, apply withWatermark to both inputs first (StreamingSpec
    * does, and asserts state cleanup semantics via the memory sink).
    */
  def correlate(cause: DataFrame, effect: DataFrame, key: String,
                horizonMinutes: Int): DataFrame = {
    val c = cause.select(col(key), col("event_id").as("cause_id"),
      col("ts").as("cause_ts"))
    val e = effect.select(col(key).as("_ekey"),
      col("event_id").as("effect_id"), col("ts").as("effect_ts"))
    c.join(e, col(key) === col("_ekey") &&
      col("effect_ts") >= col("cause_ts") &&
      col("effect_ts") <=
        col("cause_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"))
      .select(col(key), col("cause_id"), col("effect_id"),
        (unix_micros(col("effect_ts")) - unix_micros(col("cause_ts")))
          .as("delay_us"))
  }

  /** Left-outer [[correlate]]: every cause row survives; causes with no
    * effect in [cause.ts, cause.ts + horizon] carry a null effect_id /
    * delay_us — the "views that never converted" side attribution
    * inner-join drops. On streams this is Spark's watermarked LEFT OUTER
    * stream-stream join: the unmatched rows can only be EMITTED once the
    * watermark passes the cause's horizon (until then a matching effect
    * could still arrive), so outer results trail the watermark by the
    * horizon — StreamingSpec asserts exactly that emission behavior. On
    * batch frames the same call is a plain range left join (e10's
    * oracle).
    */
  def correlateOuter(cause: DataFrame, effect: DataFrame, key: String,
                     horizonMinutes: Int): DataFrame = {
    val c = cause.select(col(key), col("event_id").as("cause_id"),
      col("ts").as("cause_ts"))
    val e = effect.select(col(key).as("_ekey"),
      col("event_id").as("effect_id"), col("ts").as("effect_ts"))
    c.join(e, col(key) === col("_ekey") &&
      col("effect_ts") >= col("cause_ts") &&
      col("effect_ts") <=
        col("cause_ts") + expr(s"INTERVAL $horizonMinutes MINUTES"),
      "left")
      .select(col(key), col("cause_id"), col("effect_id"),
        (unix_micros(col("effect_ts")) - unix_micros(col("cause_ts")))
          .as("delay_us"))
  }

  /** Streaming ordered funnel (view -> click -> purchase): per-user
    * stage timestamps in mapGroupsWithState (three longs of state per
    * user), each trigger re-emitting the user's current deepest stage.
    * Within a micro-batch events sort by time; ACROSS batches arrival is
    * assumed time-ordered per user (enforce upstream with a watermark +
    * window sort if the source reorders) — an earlier-timestamped view
    * arriving after a later one was consumed cannot retroactively lower
    * t1, the same prefix-greedy semantics every O(1)-state streaming
    * funnel has. On in-order input the result equals the batch q22.
    */
  def funnelStream(events: DataFrame): Dataset[FunnelOut] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_type"))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[FunnelAcc]) =>
          var st = state.getOption.getOrElse(FunnelAcc(-1L, -1L, -1L))
          rows.toSeq.sortBy(_._2).foreach { case (_, ts, t) =>
            if (t == "view" && st.t1 < 0) st = st.copy(t1 = ts)
            else if (t == "click" && st.t1 >= 0 && ts > st.t1 &&
              st.t2 < 0) st = st.copy(t2 = ts)
            else if (t == "purchase" && st.t2 >= 0 && ts > st.t2 &&
              st.t3 < 0) st = st.copy(t3 = ts)
          }
          state.update(st)
          FunnelOut(uid,
            if (st.t3 >= 0) "view_click_purchase"
            else if (st.t2 >= 0) "view_click"
            else if (st.t1 >= 0) "view"
            else "none")
      }
  }

  /** Batch form of the dead-sensor monitor: per-user gaps between
    * CONSECUTIVE events longer than `gapSeconds` — one key shuffle, a
    * lead() window in µs (exact, oracle-reproducible). The trailing
    * open gap (silence continuing past the last event) has no batch
    * answer — that is precisely what the streaming form's event-time
    * timeout adds.
    */
  def silenceGaps(events: DataFrame, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("ts"), col("event_id"),
      unix_micros(col("ts")).as("_us"))
      .withColumn("_nextUs", lead(col("_us"), 1).over(w))
      .where(col("_nextUs").isNotNull &&
        col("_nextUs") - col("_us") > gapSeconds * 1000000L)
      .select(col("user_id"), col("ts").as("silent_from"),
        timestamp_micros(col("_nextUs")).as("resumed_at"),
        round((col("_nextUs") - col("_us")).cast("double") / 1e6, 6)
          .as("gap_sec"))
  }

  /** Streaming dead-sensor alerts: a key that stays silent for
    * `gapSeconds` of EVENT TIME past its last event fires an alert when
    * the watermark passes that deadline — the timeout-DRIVEN member of
    * the streaming family (e2 uses timeouts to close sessions; here the
    * timeout IS the signal: no new data ever arrives to trigger
    * emission, which no batch view can express). State is one long per
    * live key; an alert clears the state, so a forever-dead sensor
    * alerts once, and any later event re-arms monitoring.
    */
  def gapAlertStream(events: DataFrame, gapSeconds: Long,
                     watermark: String = "10 minutes")
    : Dataset[GapAlert] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(GapAlert(uid, new Timestamp(last),
              gapSeconds.toDouble))
          } else {
            val latest = rows.map(_._2.getTime).max
            val last = math.max(state.getOption.getOrElse(Long.MinValue),
              latest)
            state.update(last)
            state.setTimeoutTimestamp(last + gapSeconds * 1000L)
            Iterator.empty
          }
      }
  }

  /** Streaming per-key EWMA — the O(1)-state smoother behind rate /
    * spend / latency anomaly monitors: state is ONE (ewma, count) pair
    * per user, folded in (ts, event_id) order with
    * ewma' = (1-alpha)*ewma + alpha*value (first event seeds the mean).
    * Within a micro-batch events sort by time; ACROSS batches arrival is
    * assumed time-ordered per user (the funnelStream contract) — on
    * in-order input the final state is bit-equal to one batch fold over
    * the whole history, because the recurrence is a left fold and
    * concatenating ordered slices IS the whole ordered sequence (no
    * merge step exists — unlike e6's max-registers or e12's sum-cells,
    * order DEPENDENCE is the point being tested; StreamingSpec pins
    * split-equality on ordered slices).
    *
    * Run on a batch frame, mapGroupsWithState sees each user's full
    * iterator with empty state — exactly one micro-batch — which is the
    * oracle-checkable gate form (the e6 argument); the DuckDB oracle
    * replays the identical fold with list_reduce.
    */
  /** Running mean/variance per key (Welford's algorithm — the numerically
    * stable online second moment): the anomaly-detection companion of
    * [[ewmaStream]], giving each key the z-score denominator a threshold
    * monitor needs. State is three numbers per key forever; the update
    * is the e17 determinism contract — rows fold in (ts, event_id)
    * order and every IEEE op (delta/n, delta·delta2) is replayed
    * exactly by the oracle's recursive-CTE walk, so doubles match
    * bit-for-bit (an engine-native var_samp would differ in ulps —
    * that's why the fold is pinned, not the aggregate). Identical call
    * works on batch (the e22 gate form) and readStream (update mode).
    */
  def welfordStream(events: DataFrame): Dataset[WelfordOut] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[WelfordAcc]) =>
          var acc = state.getOption.getOrElse(WelfordAcc(0L, 0.0, 0.0))
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, v) =>
            val n = acc.n + 1
            val delta = v - acc.mean
            val mean = acc.mean + delta / n
            acc = WelfordAcc(n, mean, acc.m2 + delta * (v - mean))
          }
          state.update(acc)
          WelfordOut(uid, acc.n, acc.mean,
            if (acc.n > 1) Some(acc.m2 / (acc.n - 1)) else None)
      }
  }

  def ewmaStream(events: DataFrame, alpha: Double): Dataset[EwmaOut] = {
    val sp = events.sparkSession
    import sp.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")),
        col("event_id").cast("long"), col("value").cast("double"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: GroupState[EwmaAcc]) =>
          var acc = state.getOption
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, _, _, v) =>
            acc = Some(acc match {
              case Some(a) =>
                EwmaAcc((1 - alpha) * a.ewma + alpha * v, a.n + 1)
              case None => EwmaAcc(v, 1L)
            })
          }
          val a = acc.get
          state.update(a)
          EwmaOut(uid, a.n, a.ewma)
      }
  }
}

/** Dead-sensor alert: the key went silent at `silent_from` and stayed
  * silent for at least `gap_sec` of event time. */
case class GapAlert(user_id: Long, silent_from: Timestamp,
                    gap_sec: Double)

/** Streaming EWMA state: the running mean and how many events fed it. */
case class EwmaAcc(ewma: Double, n: Long)

/** Welford state: count, running mean, running sum of squared deviations. */
case class WelfordAcc(n: Long, mean: Double, m2: Double)

/** Per-trigger Welford row; variance is None below two observations. */
case class WelfordOut(user_id: Long, n_events: Long, mean: Double,
                      variance: Option[Double])

/** Per-trigger EWMA row. */
case class EwmaOut(user_id: Long, n_events: Long, ewma: Double)

/** Streaming funnel state: stage entry times in µs, -1 = not reached. */
case class FunnelAcc(t1: Long, t2: Long, t3: Long)

/** Per-trigger funnel stage row. */
case class FunnelOut(user_id: Long, funnel_stage: String)
