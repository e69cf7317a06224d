package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.Events

/** Batch-equivalent forms of the streaming operators over the `events`
  * table, oracle-checked in DuckDB. The streaming variants (watermarks,
  * dropDuplicatesWithinWatermark, flatMapGroupsWithState) share the same
  * semantics and are exercised in the ScalaTest suite with a memory sink.
  */
object Streaming {

  /** events.parquet's `ts` physical encoding has drifted across driver
    * regenerations, so the adapter normalizes every encoding seen so far
    * to a session-TZ TIMESTAMP before any `unix_micros`/window math:
    *   - TIMESTAMP(NANOS) + spark.sql.legacy.parquet.nanosAsLong=true →
    *     LongType nanos; µs-precision data makes `div 1000` exact
    *   - TIMESTAMP_MICROS isAdjustedToUTC=false → TimestampNTZType; the
    *     session timezone is pinned UTC in every entrypoint, so the cast
    *     relabels the same micros value (numerically exact)
    *   - TIMESTAMP_MICROS isAdjustedToUTC=true → TimestampType; no-op
    * Tolerance for both long-nanos and NTZ is pinned in StreamingSpec
    * ("events adapter" fixtures) so a future re-encode breaks a unit
    * test, not the correctness gate.
    */
  private[graft] def normalizeTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }

  private def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(spark.read.parquet(s"$dir/events.parquet"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_window_agg" -> ((s, dir) => {
      Events.tumblingAgg(events(s, dir), "hour")
    }),

    "e2_sessionize" -> ((s, dir) => {
      Events.sessionize(events(s, dir), gapMinutes = 30)
        .withColumn("session_idx", col("session_idx").cast("long"))
    }),

    "e3_stream_dedup" -> ((s, dir) => {
      // batch form of first-event-wins dedup by (user_id, event_type)
      events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(col("event_id")).as("first_event"),
          min(col("ts")).as("first_ts"),
          count(lit(1)).as("n_events"))
    }),

    "e4_stream_enrich" -> ((s, dir) => {
      val dim = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey").as("user_id"),
          col("c_nationkey").cast("long").as("nation_key"),
          col("c_mktsegment").as("segment"))
      Events.enrich(events(s, dir), dim, "user_id")
        .select("event_id", "user_id", "event_type", "ts", "value",
          "nation_key", "segment")
    }),

    "e5_stream_join" -> ((s, dir) => {
      // view -> purchase attribution within 30 min per user (batch form
      // of the watermarked stream-stream interval join in StreamingSpec)
      val ev = events(s, dir)
      Events.correlate(ev.where(col("event_type") === "view"),
        ev.where(col("event_type") === "purchase"), "user_id",
        horizonMinutes = 30)
    }),

    "e10_stream_outer" -> ((s, dir) => {
      // left-outer attribution: views that never converted survive with
      // null effect_id (batch form of the watermarked LEFT OUTER
      // stream-stream join; emission-after-watermark is asserted in
      // StreamingSpec)
      val ev = events(s, dir)
      Events.correlateOuter(ev.where(col("event_type") === "view"),
        ev.where(col("event_type") === "purchase"), "user_id",
        horizonMinutes = 30)
    }),

    "q14_asof_join" -> ((s, dir) => {
      // backward as-of join: each purchase picks up the user's most recent
      // view at-or-before it (union+window plan, one shuffle — see
      // graft.operators.AsOfJoin); DuckDB's native ASOF LEFT JOIN is the
      // oracle
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      graft.operators.AsOfJoin.asofBackward(purchases, views,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        payload = Seq("view_id", "view_value"), rightTieBreak = "view_id")
    }),

    "q27_asof_forward" -> ((s, dir) => {
      // forward as-of: each purchase attributes to the user's NEXT view
      // at-or-after it (same one-shuffle plan as q14, walked descending)
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("next_view_id"),
          col("value").as("next_view_value"))
      graft.operators.AsOfJoin.asofForward(purchases, views,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        payload = Seq("next_view_id", "next_view_value"),
        rightTieBreak = "next_view_id")
    }),

    "q33_asof_nearest" -> ((s, dir) => {
      // nearest as-of (merge_asof direction='nearest'): each purchase
      // attaches the closest view in EITHER time direction, equidistant
      // -> backward; both walk directions evaluate as two windows over
      // ONE key exchange (one extra sort, no extra shuffle vs q14)
      val ev = events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val views = ev.where(col("event_type") === "view")
        .select(col("user_id"), col("ts"),
          col("event_id").as("view_id"), col("value").as("view_value"))
      graft.operators.AsOfJoin.asofNearest(purchases, views,
        key = "user_id", leftTs = "ts", rightTs = "ts",
        payload = Seq("view_id", "view_value"), rightTieBreak = "view_id")
    }),

    "q15_hll_distinct" -> ((s, dir) => {
      // portable HyperLogLog distinct users per event type (md5 register
      // math the DuckDB oracle reproduces exactly) next to the exact count
      val hll = graft.operators.Sketches.hllDistinct(
        events(s, dir), Seq("event_type"), "user_id")
      val exact = events(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(hll, Seq("event_type"))
    }),

    "q34_hll_setops" -> ((s, dir) => {
      // distinct-set ALGEBRA on sketches (audience overlap): the two
      // cohorts' 256-byte register sets max-merge into the union
      // estimate, inclusion-exclusion gives the intersection — no
      // second pass over rows; exact intersection sits alongside for
      // calibration (q15's portability argument extended to set ops)
      graft.operators.Sketches.hllSetOps(events(s, dir),
        "event_type", "user_id", "view", "purchase")
    }),

    "e6_stream_hll" -> ((s, dir) => {
      // the STREAMING sketch run batch-equivalently: mapGroupsWithState
      // on a batch frame processes each group's full iterator with empty
      // initial state — exactly one micro-batch — so the gate hashes the
      // same register-update code the stream runs (multi-batch register
      // merging is covered by StreamingSpec's bit-equality test)
      graft.streaming.StreamSketches.hllDistinctStream(
        events(s, dir).select(col("event_type"), col("user_id")),
        "event_type", "user_id")
        .toDF().withColumnRenamed("group", "event_type")
    }),

    "e22_stream_welford" -> ((s, dir) => {
      // running per-user mean/variance (Welford), batch-equivalently:
      // the z-score denominator for threshold monitors; e17's contract
      // — (ts, event_id)-ordered fold, every IEEE op replayed by the
      // oracle's recursive walk (a native var_samp differs in ulps)
      graft.streaming.Events.welfordStream(
        events(s, dir).select("user_id", "ts", "event_id", "value"))
        .toDF()
        .withColumn("mean", round(col("mean"), 6))
        .withColumn("variance", round(col("variance"), 6))
    }),

    "e21_stream_kmeans" -> ((s, dir) => {
      // streaming k-means TRAINING, batch-equivalently: MacQueen's
      // sequential update folded in vec_id order (the e17 determinism
      // contract — every IEEE op replayed by the oracle's recursive
      // CTE); state = k·d doubles + k longs forever; StreamingSpec
      // proves two ordered micro-batch slices == this batch fold
      val vecs = s.read.parquet(s"$dir/embeddings.parquet")
        .select(lit(0L).as("group"), col("vec_id"), col("embedding"))
      graft.streaming.StreamKmeans.centroidRows(
        graft.streaming.StreamKmeans.kmeansStream(vecs, k = 4))
        .drop("group")
    }),

    "e19_stream_sample" -> ((s, dir) => {
      // deterministic stream sampling, batch-equivalently: stateless
      // md5-draw admission — identical row set on stream, replay, and
      // retry (StreamingSpec runs the same call on a MemoryStream)
      graft.streaming.Events.sampleEvents(events(s, dir),
        rate = 0.25, salt = "es")
        .select("event_id", "user_id", "event_type", "ts")
    }),

    "e20_stream_checksum" -> ((s, dir) => {
      // running replication-verification fingerprint, batch-equivalently:
      // u10's commutative folds as per-group streaming state (four longs
      // forever); StreamingSpec proves complete-mode == batch
      graft.streaming.Events.checksumStream(events(s, dir),
        Seq("event_type"), Seq("event_id", "user_id", "event_type"))
    }),

    "e18_gap_alerts" -> ((s, dir) => {
      // the dead-sensor monitor's batch form: consecutive-event gaps
      // over 6h per user (one key shuffle + a µs-exact lead window);
      // the trailing-silence alert only the streaming timeout can
      // express is pinned in StreamingSpec
      graft.streaming.Events.silenceGaps(events(s, dir),
        gapSeconds = 6 * 3600)
    }),

    "e17_stream_ewma" -> ((s, dir) => {
      // the streaming anomaly-monitor smoother, batch-equivalently (one
      // micro-batch, the e6 argument): per-user EWMA folded in event
      // order — O(1) state per user; the oracle replays the identical
      // left fold with list_reduce, bit-equal doubles
      graft.streaming.Events.ewmaStream(
        events(s, dir).select("user_id", "ts", "event_id", "value"),
        alpha = 0.3)
        .toDF().withColumn("ewma", round(col("ewma"), 6))
    }),

    "e13_stream_hist" -> ((s, dir) => {
      // the STREAMING histogram-quantile sketch, batch-equivalently (one
      // micro-batch, same argument as e6/e12): per-(event_type, bucket)
      // counts at binWidth 10; quantile read-out is q18's batch tail
      graft.streaming.StreamSketches.histStream(
        events(s, dir).select(col("event_type"), col("value")),
        "event_type", "value", binWidth = 10.0).toDF()
        .withColumnRenamed("group", "event_type")
    }),

    "e12_stream_cms" -> ((s, dir) => {
      // the STREAMING Count-Min counter matrix, batch-equivalently (one
      // micro-batch, same argument as e6): the gate hashes the same
      // counter-update code the stream runs; multi-batch sum-merging is
      // covered by StreamingSpec's cell-for-cell equality test
      graft.streaming.StreamSketches.cmsStream(
        events(s, dir).select(col("user_id")), "user_id").toDF()
    }),

    "e14_stream_topk" -> ((s, dir) => {
      // the STREAMING sharded space-saving summary, batch-equivalently:
      // capacity far above the per-shard distinct-user count, so no
      // eviction fires and every entry is exact (ss_err 0) — which is
      // precisely what the oracle can recompute. Bounded-capacity
      // eviction (the part SQL cannot express) is covered by
      // StreamingSpec's guarantee tests.
      graft.streaming.StreamSketches.spaceSavingStream(
        events(s, dir).select(col("user_id")), "user_id",
        capacity = 1 << 20).toDF()
    }),

    "e16_stream_upsert" -> ((s, dir) => {
      // the STREAMING CDC upsert materialization, batch-equivalently
      // (one micro-batch, same argument as e6): events read as a keyed
      // changelog — LSN = event_id, 'error' events are deletes — folded
      // to ONE materialized row per key; out-of-order multi-batch
      // behavior (late low-seq loses) is StreamingSpec's job
      graft.streaming.Upsert.upsertStream(
        events(s, dir).select(col("user_id"), col("event_id"),
          when(col("event_type") === "error", "D").otherwise("U")
            .as("op"),
          col("value")),
        "user_id", "event_id", "op", "value").toDF()
    }),

    "e9_stream_funnel" -> ((s, dir) => {
      // the STREAMING funnel state machine, batch-equivalently (same
      // one-micro-batch argument as e6): per-user final stage rows
      graft.streaming.Events.funnelStream(events(s, dir)).toDF()
    }),

    "q16_heavy_hitters" -> ((s, dir) => {
      // Count-Min-sketch top-10 users by event volume: the sketch state
      // that crosses the shuffle is 4x256 counters regardless of input
      // size; exact counts sit alongside to surface the CMS >= truth bias
      graft.operators.Sketches.cmsTopK(events(s, dir), "user_id", k = 10)
    }),

    "e8_json" -> ((s, dir) => {
      // semi-structured parsing: the props JSON column -> typed field,
      // then a per-type rollup (get_json_object is codegen'd; no UDF)
      events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          round(avg(col("k")), 4).as("avg_k"),
          sum(when(col("k") > 50, 1).otherwise(0)).as("n_over_50"))
    }),

    "q23_rolling" -> ((s, dir) => {
      // bounded window frames: per-user 3-event moving sum/avg ordered
      // by time (frame = ROWS 2 PRECEDING..CURRENT — state bounded, no
      // unbounded accumulation)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-2, 0)
      events(s, dir).select(col("user_id"), col("event_id"),
        round(sum(col("value")).over(w), 4).as("mov_sum"),
        round(avg(col("value")).over(w), 4).as("mov_avg"),
        count(lit(1)).over(w).as("frame_n"))
    }),

    "e7_resample" -> ((s, dir) => {
      // time-series resample + forward fill: an hourly grid per user
      // (sequence explode between each user's first/last hour) carries
      // the latest at-or-before value via the SAME one-shuffle as-of
      // join q14 uses; bucket counts left-join back with 0 on gaps
      val ev = events(s, dir)
      val grid = ev.groupBy(col("user_id"))
        .agg(date_trunc("hour", min(col("ts"))).as("_h0"),
          date_trunc("hour", max(col("ts"))).as("_h1"))
        .select(col("user_id"), explode(sequence(col("_h0"), col("_h1"),
          expr("interval 1 hour"))).as("hour_ts"))
      val filled = graft.operators.AsOfJoin.asofBackward(
        grid,
        ev.select(col("user_id"), col("ts"), col("event_id").as("_eid"),
          col("value").as("filled_value")),
        key = "user_id", leftTs = "hour_ts", rightTs = "ts",
        payload = Seq("filled_value"), rightTieBreak = "_eid")
      val counts = ev
        .groupBy(col("user_id"),
          date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("n_events"))
      filled.join(counts, Seq("user_id", "hour_ts"), "left")
        .na.fill(0L, Seq("n_events"))
    }),

    "q22_funnel" -> ((s, dir) => {
      // ordered funnel (view -> click -> purchase): stage timestamps are
      // nested conditional mins over the SAME user window, so all three
      // stages resolve in one key shuffle (Catalyst reuses the exchange
      // across the stacked Window ops) — no per-stage join cascade
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
      val t1 = min(when(col("event_type") === "view", col("ts"))).over(w)
      val staged = events(s, dir)
        .withColumn("_t1", t1)
        .withColumn("_t2", min(when(col("event_type") === "click" &&
          col("ts") > col("_t1"), col("ts"))).over(w))
        .withColumn("_t3", min(when(col("event_type") === "purchase" &&
          col("ts") > col("_t2"), col("ts"))).over(w))
      staged.select(col("user_id"), col("_t1"), col("_t2"), col("_t3"))
        .distinct()
        .select(col("user_id"),
          when(col("_t3").isNotNull, "view_click_purchase")
            .when(col("_t2").isNotNull, "view_click")
            .when(col("_t1").isNotNull, "view")
            .otherwise("none").as("funnel_stage"))
        .groupBy(col("funnel_stage"))
        .agg(count(lit(1)).as("n_users"))
    }),

    "u3_compact_latest" -> ((s, dir) => {
      // changelog compaction: latest state per key WITHOUT a window —
      // max(struct(ts, tiebreak, payload)) is a partial-aggregable
      // lexicographic arg-max, so each map task ships one row per key
      // (a row_number window would sort whole partitions instead)
      events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.ts").as("last_ts"),
          col("m.event_id").as("last_event_id"),
          col("m.event_type").as("last_event_type"),
          col("m.value").as("last_value"))
    }),

    "q35_unpivot" -> ((s, dir) => {
      // the melt half of q19's pivot: the wide per-user count matrix
      // unpivots back to long (user_id, metric, n_events) rows with
      // Spark's native unpivot (codegen'd Expand — one pass, no
      // explode UDF games); zero cells drop so the round trip equals
      // the direct long-form aggregation the oracle computes
      events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"),
          col("view").as("n_view"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("error").as("n_error"))
        .unpivot(Array(col("user_id")),
          Array(col("n_click"), col("n_view"), col("n_purchase"),
            col("n_signup"), col("n_error")),
          "metric", "n_events")
        .where(col("n_events") > 0)
    }),

    "q19_pivot" -> ((s, dir) => {
      // wide-format rollup: event counts pivoted to one column per type.
      // Explicit value list => single-pass pivot, no extra distinct scan
      events(s, dir)
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select(col("user_id"), col("click").as("n_click"),
          col("view").as("n_view"), col("purchase").as("n_purchase"),
          col("signup").as("n_signup"), col("error").as("n_error"))
    })
  )

  val oracles: Map[String, String] = Map(
    "e1_window_agg" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "e2_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |           OR lag(ts) OVER w IS NULL
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sessions AS (
        |  SELECT user_id, ts, event_id, value,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  count(*) AS n_events, round(sum(value), 4) AS sum_value
        |FROM sessions GROUP BY 1, 2""".stripMargin,

    "e3_stream_dedup" ->
      """SELECT user_id, event_type,
        |  min(event_id) AS first_event, min(ts) AS first_ts,
        |  count(*) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,

    "e4_stream_enrich" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.ts, e.value,
        |  c.c_nationkey AS nation_key, c.c_mktsegment AS segment
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey"""
        .stripMargin,

    "e5_stream_join" ->
      """SELECT v.user_id,
        |  v.event_id AS cause_id, p.event_id AS effect_id,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS delay_us
        |FROM events v JOIN events p
        |  ON v.user_id = p.user_id
        |  AND v.event_type = 'view' AND p.event_type = 'purchase'
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTES"""
        .stripMargin,

    "e10_stream_outer" ->
      """SELECT v.user_id,
        |  v.event_id AS cause_id, p.event_id AS effect_id,
        |  epoch_us(p.ts) - epoch_us(v.ts) AS delay_us
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON v.user_id = p.user_id
        |  AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTES"""
        .stripMargin,

    "q14_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |v0 AS (
        |  SELECT user_id, ts, event_id AS view_id, value AS view_value
        |  FROM events WHERE event_type = 'view'),
        |v AS (
        |  SELECT user_id, ts, view_id, view_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY view_id DESC) AS rn FROM v0)
        |  WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  v.view_id, v.view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.ts <= p.ts""".stripMargin,

    "q27_asof_forward" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |v0 AS (
        |  SELECT user_id, ts, event_id AS next_view_id,
        |    value AS next_view_value
        |  FROM events WHERE event_type = 'view'),
        |v AS (
        |  SELECT user_id, ts, next_view_id, next_view_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY next_view_id) AS rn FROM v0)
        |  WHERE rn = 1)
        |SELECT p.event_id, p.user_id, p.ts, p.value,
        |  v.next_view_id, v.next_view_value
        |FROM p ASOF LEFT JOIN v
        |  ON p.user_id = v.user_id AND v.ts >= p.ts""".stripMargin,

    "q33_asof_nearest" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts, value FROM events
        |  WHERE event_type = 'purchase'),
        |v0 AS (
        |  SELECT user_id, ts, event_id AS view_id, value AS view_value
        |  FROM events WHERE event_type = 'view'),
        |vb AS (
        |  SELECT user_id, ts, view_id, view_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY view_id DESC) AS rn FROM v0)
        |  WHERE rn = 1),
        |vf AS (
        |  SELECT user_id, ts, view_id, view_value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY view_id) AS rn FROM v0)
        |  WHERE rn = 1),
        |b AS (
        |  SELECT p.event_id, p.user_id, p.ts, p.value,
        |    v.ts AS bts, v.view_id AS bid, v.view_value AS bval
        |  FROM p ASOF LEFT JOIN vb v
        |    ON p.user_id = v.user_id AND v.ts <= p.ts),
        |f AS (
        |  SELECT p.event_id,
        |    v.ts AS fts, v.view_id AS fid, v.view_value AS fval
        |  FROM p ASOF LEFT JOIN vf v
        |    ON p.user_id = v.user_id AND v.ts >= p.ts)
        |SELECT b.event_id, b.user_id, b.ts, b.value,
        |  CASE WHEN fts IS NULL THEN bid WHEN bts IS NULL THEN fid
        |    WHEN (b.ts - bts) <= (fts - b.ts) THEN bid ELSE fid END
        |    AS view_id,
        |  CASE WHEN fts IS NULL THEN bval WHEN bts IS NULL THEN fval
        |    WHEN (b.ts - bts) <= (fts - b.ts) THEN bval ELSE fval END
        |    AS view_value
        |FROM b JOIN f USING (event_id)""".stripMargin,

    "q34_hll_setops" ->
      """WITH b AS (
        |  SELECT event_type AS lbl,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(1, 3)], (a, c) -> a * 16 + c) AS idx,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(3, 9)], (a, c) -> a * 16 + c) AS rest
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |r AS (
        |  SELECT lbl, idx,
        |    max(CASE WHEN rest = 0 THEN 25
        |        ELSE 25 - length(bin(rest)) END) AS r
        |  FROM b GROUP BY 1, 2),
        |ef AS (
        |  SELECT lbl,
        |    CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |        / (sp + (256 - cnt)::DOUBLE) <= 640.0 AND 256 - cnt > 0
        |      THEN 256.0 * ln(256.0 / (256 - cnt)::DOUBLE)
        |      ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |        / (sp + (256 - cnt)::DOUBLE) END AS est
        |  FROM (SELECT lbl, count(*) AS cnt, sum(pow(2.0, -r)) AS sp
        |        FROM r GROUP BY 1)),
        |ur AS (SELECT idx, max(r) AS r FROM r GROUP BY 1),
        |eu AS (
        |  SELECT CASE WHEN (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |        / (sp + (256 - cnt)::DOUBLE) <= 640.0 AND 256 - cnt > 0
        |      THEN 256.0 * ln(256.0 / (256 - cnt)::DOUBLE)
        |      ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |        / (sp + (256 - cnt)::DOUBLE) END AS eu
        |  FROM (SELECT count(*) AS cnt, sum(pow(2.0, -r)) AS sp
        |        FROM ur)),
        |x AS (
        |  SELECT CAST(sum(CASE WHEN nl = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS exact_intersection
        |  FROM (SELECT user_id, count(DISTINCT event_type) AS nl
        |        FROM events WHERE event_type IN ('view', 'purchase')
        |        GROUP BY 1)),
        |ab AS (
        |  SELECT max(CASE WHEN lbl = 'view' THEN est END) AS ea,
        |    max(CASE WHEN lbl = 'purchase' THEN est END) AS eb
        |  FROM ef)
        |SELECT round(ea, 4) AS est_a, round(eb, 4) AS est_b,
        |  round(eu, 4) AS est_union,
        |  round(greatest(0.0, ea + eb - eu), 4) AS est_intersection,
        |  round(greatest(0.0, ea + eb - eu) / eu, 4) AS jaccard_est,
        |  exact_intersection
        |FROM ab, eu, x""".stripMargin,

    "q15_hll_distinct" ->
      """WITH b AS (
        |  SELECT event_type,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(1, 3)], (a, c) -> a * 16 + c) AS idx,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(3, 9)], (a, c) -> a * 16 + c) AS rest
        |  FROM events),
        |r AS (
        |  SELECT event_type, idx,
        |    max(CASE WHEN rest = 0 THEN 25
        |        ELSE 25 - length(bin(rest)) END) AS r
        |  FROM b GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, count(*) AS cnt, sum(pow(2.0, -r)) AS sp
        |  FROM r GROUP BY 1),
        |est AS (
        |  SELECT event_type,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |      / (sp + (256 - cnt)::DOUBLE) AS raw,
        |    256 - cnt AS zeros
        |  FROM g)
        |SELECT e.event_type, x.n_exact,
        |  round(CASE WHEN raw <= 640.0 AND zeros > 0
        |    THEN 256.0 * ln(256.0 / zeros::DOUBLE) ELSE raw END, 4)
        |    AS hll_estimate
        |FROM est e JOIN (
        |  SELECT event_type, count(DISTINCT user_id) AS n_exact
        |  FROM events GROUP BY 1) x USING (event_type)""".stripMargin,

    "e22_stream_welford" ->
      """WITH RECURSIVE e AS MATERIALIZED (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |mx AS (SELECT CAST(max(rn) AS BIGINT) AS m FROM e),
        |w AS (
        |  SELECT user_id, CAST(0 AS BIGINT) AS n,
        |    CAST(0.0 AS DOUBLE) AS mean,
        |    CAST(0.0 AS DOUBLE) AS m2, CAST(0 AS BIGINT) AS it
        |  FROM (SELECT DISTINCT user_id FROM e)
        |  UNION ALL
        |  SELECT w.user_id,
        |    CASE WHEN e.value IS NULL THEN w.n ELSE w.n + 1 END,
        |    CASE WHEN e.value IS NULL THEN w.mean
        |      ELSE w.mean + (e.value - w.mean)
        |        / CAST(w.n + 1 AS DOUBLE) END,
        |    CASE WHEN e.value IS NULL THEN w.m2
        |      ELSE w.m2 + (e.value - w.mean) * (e.value -
        |        (w.mean + (e.value - w.mean)
        |          / CAST(w.n + 1 AS DOUBLE))) END,
        |    w.it + 1
        |  FROM w
        |  LEFT JOIN e ON e.user_id = w.user_id AND e.rn = w.it + 1
        |  WHERE w.it < (SELECT m FROM mx))
        |SELECT user_id, n AS n_events, round(mean, 6) AS mean,
        |  CASE WHEN n > 1 THEN round(m2 / (n - 1), 6) END AS variance
        |FROM w WHERE it = (SELECT m FROM mx)""".stripMargin,

    "e21_stream_kmeans" ->
      """WITH RECURSIVE v AS MATERIALIZED (
        |  SELECT row_number() OVER (ORDER BY vec_id) AS rn,
        |    CAST(embedding AS DOUBLE[]) AS x
        |  FROM embeddings),
        |nn AS (SELECT CAST(max(rn) AS BIGINT) AS nmax FROM v),
        |init AS (
        |  SELECT CAST(4 AS BIGINT) AS it,
        |    (SELECT list(x ORDER BY rn) FROM v WHERE rn <= 4) AS cents,
        |    [CAST(1 AS BIGINT), 1, 1, 1] AS ns),
        |walk AS (
        |  SELECT * FROM init
        |  UNION ALL
        |  SELECT t.it + 1 AS it,
        |    list_transform([1, 2, 3, 4], ci ->
        |      CASE WHEN ci = t.j THEN
        |        list_transform(range(1, 65), d ->
        |          t.cents[ci][d] + (t.x[d] - t.cents[ci][d])
        |            / CAST(t.ns[ci] + 1 AS DOUBLE))
        |      ELSE t.cents[ci] END) AS cents,
        |    list_transform([1, 2, 3, 4], ci ->
        |      t.ns[ci] + CASE WHEN ci = t.j THEN 1 ELSE 0 END) AS ns
        |  FROM (
        |    SELECT w.it, w.cents, w.ns, v.x,
        |      list_position(
        |        list_transform(w.cents, c ->
        |          list_reduce(list_transform(range(1, 65), i ->
        |            (v.x[i] - c[i]) * (v.x[i] - c[i])), (a, b) -> a + b)),
        |        list_min(list_transform(w.cents, c ->
        |          list_reduce(list_transform(range(1, 65), i ->
        |            (v.x[i] - c[i]) * (v.x[i] - c[i])), (a, b) -> a + b))))
        |        AS j
        |    FROM walk w JOIN v ON v.rn = w.it + 1) t),
        |fin AS (
        |  SELECT cents, ns FROM walk
        |  WHERE it = (SELECT nmax FROM nn))
        |SELECT CAST(ci - 1 AS BIGINT) AS centroid_id,
        |  CAST(d - 1 AS BIGINT) AS dim_idx,
        |  round(cents[ci][d], 6) AS value,
        |  CAST(ns[ci] AS BIGINT) AS n_assigned
        |FROM fin,
        |  (SELECT unnest(range(1, 5)) AS ci),
        |  (SELECT unnest(range(1, 65)) AS d)""".stripMargin,

    "e19_stream_sample" ->
      """SELECT event_id, user_id, event_type, ts FROM events
        |WHERE list_reduce([strpos('0123456789abcdef',
        |    substr(md5('es' || CAST(event_id AS VARCHAR)), j, 1)) - 1
        |  for j in range(1, 9)], (a, c) -> a * 16 + c)::DOUBLE
        |  < 0.25 * 4294967296.0""".stripMargin,

    "e20_stream_checksum" ->
      """WITH h AS (
        |  SELECT event_type, md5(concat_ws('|',
        |    coalesce(CAST(event_id AS VARCHAR), '∅'),
        |    coalesce(CAST(user_id AS VARCHAR), '∅'),
        |    coalesce(event_type, '∅'))) AS hh
        |  FROM events),
        |v AS (
        |  SELECT event_type,
        |    list_reduce([strpos('0123456789abcdef', substr(hh, j, 1)) - 1
        |      for j in range(1, 9)], (a, c) -> a * 16 + c) AS v1,
        |    list_reduce([strpos('0123456789abcdef', substr(hh, j, 1)) - 1
        |      for j in range(9, 17)], (a, c) -> a * 16 + c) AS v2
        |  FROM h)
        |SELECT event_type, count(*) AS n_rows,
        |  CAST(bit_xor(v1) AS BIGINT) AS xor1,
        |  CAST(bit_xor(v2) AS BIGINT) AS xor2,
        |  CAST(sum(v1) AS BIGINT) AS sum1
        |FROM v GROUP BY 1""".stripMargin,

    "e18_gap_alerts" ->
      """WITH g AS (
        |  SELECT user_id, ts, epoch_us(ts) AS us,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nus
        |  FROM events)
        |SELECT user_id, ts AS silent_from,
        |  make_timestamp(nus) AS resumed_at,
        |  round(CAST(nus - us AS DOUBLE) / 1e6, 6) AS gap_sec
        |FROM g
        |WHERE nus IS NOT NULL
        |  AND nus - us > CAST(21600 AS BIGINT) * 1000000""".stripMargin,

    "e17_stream_ewma" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(list_reduce(list(value ORDER BY ts, event_id),
        |    (a, b) -> (1 - 0.3) * a + 0.3 * b), 6) AS ewma
        |FROM events GROUP BY 1""".stripMargin,

    "e6_stream_hll" ->
      """WITH b AS (
        |  SELECT event_type,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(1, 3)], (a, c) -> a * 16 + c) AS idx,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(3, 9)], (a, c) -> a * 16 + c) AS rest
        |  FROM events),
        |r AS (
        |  SELECT event_type, idx,
        |    max(CASE WHEN rest = 0 THEN 25
        |        ELSE 25 - length(bin(rest)) END) AS r
        |  FROM b GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, count(*) AS cnt, sum(pow(2.0, -r)) AS sp
        |  FROM r GROUP BY 1),
        |est AS (
        |  SELECT event_type,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |      / (sp + (256 - cnt)::DOUBLE) AS raw,
        |    256 - cnt AS zeros
        |  FROM g)
        |SELECT event_type,
        |  round(CASE WHEN raw <= 640.0 AND zeros > 0
        |    THEN 256.0 * ln(256.0 / zeros::DOUBLE) ELSE raw END, 4)
        |    AS hll_estimate
        |FROM est""".stripMargin,

    "e9_stream_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
        |      THEN ts END) OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
        |      THEN ts END) OVER (PARTITION BY user_id) AS t3
        |  FROM s2),
        |u AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3)
        |SELECT user_id,
        |  CASE WHEN t3 IS NOT NULL THEN 'view_click_purchase'
        |       WHEN t2 IS NOT NULL THEN 'view_click'
        |       WHEN t1 IS NOT NULL THEN 'view'
        |       ELSE 'none' END AS funnel_stage
        |FROM u""".stripMargin,

    "e13_stream_hist" ->
      """SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bucket,
        |  count(*) AS hist_count
        |FROM events WHERE value IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "e12_stream_cms" ->
      """WITH rows_ AS (SELECT unnest(range(0, 4)) AS r),
        |b AS (
        |  SELECT r AS row, user_id,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(r AS VARCHAR) || ':'
        |          || CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(1, 8)], (a, c) -> a * 16 + c) % 256 AS bucket
        |  FROM events, rows_)
        |SELECT row, bucket, count(*) AS cms_count
        |FROM b GROUP BY 1, 2""".stripMargin,

    "e16_stream_upsert" ->
      """SELECT user_id AS key, event_id AS seq,
        |  CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |  "value"
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,

    "e14_stream_topk" ->
      """WITH c AS (
        |  SELECT CAST(user_id AS VARCHAR) AS value, count(*) AS ss_count
        |  FROM events GROUP BY 1)
        |SELECT CAST(list_reduce([strpos('0123456789abcdef',
        |      substr(md5(value), j, 1)) - 1
        |    for j in range(1, 8)], (a, b) -> a * 16 + b) % 16 AS INT)
        |  AS shard,
        |  value, ss_count, CAST(0 AS BIGINT) AS ss_err
        |FROM c""".stripMargin,

    "q16_heavy_hitters" ->
      """WITH rows_ AS (SELECT unnest(range(0, 4)) AS r),
        |b AS (
        |  SELECT user_id AS value, r,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(r AS VARCHAR) || ':'
        |          || CAST(user_id AS VARCHAR)), j, 1)) - 1
        |      for j in range(1, 8)], (a, c) -> a * 16 + c) % 256 AS bucket
        |  FROM events, rows_),
        |counters AS (
        |  SELECT r, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
        |cand AS (
        |  SELECT user_id AS value, count(*) AS n_true
        |  FROM events GROUP BY 1),
        |lk AS (
        |  SELECT c.value, c.n_true, x.r,
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(x.r AS VARCHAR) || ':'
        |          || CAST(c.value AS VARCHAR)), j, 1)) - 1
        |      for j in range(1, 8)], (a, c2) -> a * 16 + c2) % 256 AS bucket
        |  FROM cand c, rows_ x),
        |est AS (
        |  SELECT lk.value, max(lk.n_true) AS n_true,
        |    min(ct.cnt) AS cms_estimate
        |  FROM lk JOIN counters ct ON lk.r = ct.r AND lk.bucket = ct.bucket
        |  GROUP BY lk.value)
        |SELECT value, n_true, cms_estimate, rank FROM (
        |  SELECT *, row_number() OVER (ORDER BY cms_estimate DESC, value)
        |    AS rank FROM est)
        |WHERE rank <= 10""".stripMargin,

    "e8_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
        |    AS BIGINT) AS sum_k,
        |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
        |    AS avg_k,
        |  CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
        |    AS BIGINT) > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_over_50
        |FROM events GROUP BY 1""".stripMargin,

    "q23_rolling" ->
      """SELECT user_id, event_id,
        |  round(sum(value) OVER w, 4) AS mov_sum,
        |  round(avg(value) OVER w, 4) AS mov_avg,
        |  count(*) OVER w AS frame_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin,

    "e7_resample" ->
      """WITH g AS (
        |  SELECT user_id, unnest(generate_series(
        |    date_trunc('hour', min(ts)), date_trunc('hour', max(ts)),
        |    INTERVAL 1 HOUR)) AS hour_ts
        |  FROM events GROUP BY user_id),
        |ev AS (
        |  -- one row per (user, ts): max event_id wins, mirroring the
        |  -- Spark side's _eid tie-break (ASOF alone picks arbitrarily)
        |  SELECT user_id, ts, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn FROM events)
        |  WHERE rn = 1),
        |f AS (
        |  SELECT g.user_id, g.hour_ts, e.value AS filled_value
        |  FROM g ASOF LEFT JOIN ev e
        |    ON g.user_id = e.user_id AND e.ts <= g.hour_ts),
        |c AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour_ts,
        |    count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT f.user_id, f.hour_ts, f.filled_value,
        |  coalesce(c.n_events, 0) AS n_events
        |FROM f LEFT JOIN c USING (user_id, hour_ts)""".stripMargin,

    "q22_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, ts, event_type,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |s2 AS (
        |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t1
        |      THEN ts END) OVER (PARTITION BY user_id) AS t2
        |  FROM s1),
        |s3 AS (
        |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t2
        |      THEN ts END) OVER (PARTITION BY user_id) AS t3
        |  FROM s2),
        |u AS (SELECT DISTINCT user_id, t1, t2, t3 FROM s3)
        |SELECT CASE WHEN t3 IS NOT NULL THEN 'view_click_purchase'
        |            WHEN t2 IS NOT NULL THEN 'view_click'
        |            WHEN t1 IS NOT NULL THEN 'view'
        |            ELSE 'none' END AS funnel_stage,
        |  count(*) AS n_users
        |FROM u GROUP BY 1""".stripMargin,

    "u3_compact_latest" ->
      """SELECT user_id, ts AS last_ts, event_id AS last_event_id,
        |  event_type AS last_event_type, value AS last_value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1""".stripMargin,

    "q35_unpivot" ->
      """SELECT user_id, 'n_' || event_type AS metric,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q19_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_error
        |FROM events GROUP BY 1""".stripMargin
  )
}
