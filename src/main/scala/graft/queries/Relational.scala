package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational core queries over the TPC-H-ish test tables. Each query has a
  * DuckDB oracle with identically-aliased columns; double aggregates are
  * rounded on both sides to absorb summation-order FP noise.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private var bucketedFor: String = null

  /** One-time bucketed copies of lineitem/orders for the co-located join
    * (q12): both sides bucketed+sorted by the join key with the same
    * bucket count, so the join needs no shuffle (and no sort) — the
    * pre-partitioning strategy a 100 TB deployment bakes into its fact
    * tables. Idempotent per (JVM, sf dir).
    */
  def ensureBucketed(s: SparkSession, dir: String): Unit = synchronized {
    // memo key must include THIS session's catalog, not just the JVM:
    // the table registration lives in the session catalog, so a second
    // SparkSession in the same JVM (suite B after suite A) would see the
    // memo hit but resolve s.table(...) against a catalog that never
    // heard of the tables
    if (bucketedFor == dir && s.catalog.tableExists("graft_li_bucketed")
      && s.catalog.tableExists("graft_o_bucketed")) return
    val base = "/root/repo/target/bucketed"
    def write(df: DataFrame, key: String, table: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $table")
      df.write.mode("overwrite")
        .bucketBy(8, key).sortBy(key)
        .option("path", s"$base/$dir/$table".replace("//", "/"))
        .saveAsTable(table)
    }
    write(t(s, dir, "lineitem"), "l_orderkey", "graft_li_bucketed")
    write(t(s, dir, "orders"), "o_orderkey", "graft_o_bucketed")
    bucketedFor = dir
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    "q2_join_broadcast" -> ((s, dir) => {
      // star join: fact lineitem -> orders -> customer -> nation -> region;
      // dims broadcast so the only shuffle is the final aggregation.
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = broadcast(t(s, dir, "nation"))
      val r = broadcast(t(s, dir, "region"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    "q3_topk" -> ((s, dir) => {
      // per-brand top-3 via the native bounded_top_k aggregate: the heap
      // partial-aggregates map-side, so only <= 3 rows per (brand, task)
      // reach the shuffle (vs a window shipping every revenue row)
      graft.plans.BoundedTopK.register(s)
      val li = t(s, dir, "lineitem")
      val p = broadcast(t(s, dir, "part"))
      val rev = li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(round(sum(col("l_extendedprice")), 4).as("revenue"))
      rev.groupBy(col("p_brand"))
        .agg(expr("bounded_top_k(struct(revenue, p_partkey), 3)").as("_tk"))
        .select(col("p_brand"), posexplode(col("_tk")).as(Seq("_r", "_e")))
        .select(col("p_brand"), col("_e.id").as("p_partkey"),
          col("_e.score").as("revenue"),
          (col("_r") + 1).cast("long").as("rnk"))
    }),

    "q4_filter_pushdown" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where(col("l_quantity") > 45 && col("l_discount") >= 0.05)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_discount"))
    }),

    "q5_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withOrders = c.join(o, col("c_custkey") === col("o_custkey"),
        "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .withColumn("kind", lit("with_orders"))
      val withoutOrders = c.join(o, col("c_custkey") === col("o_custkey"),
        "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .withColumn("kind", lit("without_orders"))
      withOrders.unionByName(withoutOrders)
    }),

    "q6_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_extendedprice")), 4).as("sum_price"),
          count(lit(1)).as("n_rows"))
    }),

    "q7_window" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      o.select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 4).as("running_total"),
        row_number().over(w).cast("long").as("order_seq"))
    }),

    "q8_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
    }),

    "q9_skewjoin" -> ((s, dir) => {
      // orderkey join is Zipf-ish in real data; AQE skew-join splits hot
      // partitions at runtime (enabled in the session conf).
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"))
    }),

    "q11_salted_join" -> ((s, dir) => {
      // explicit deterministic salting (graft.operators.Skew) as the
      // AQE-independent skew answer: same result as the plain join
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      graft.operators.Skew.saltedJoin(li, o, Seq("l_orderkey"),
        col("l_linenumber"), salts = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"))
    }),

    "q12_bucketed_join" -> ((s, dir) => {
      // co-located join on pre-bucketed tables: zero exchanges on either
      // join side (asserted in PlanSpec)
      ensureBucketed(s, dir)
      s.table("graft_li_bucketed")
        .join(s.table("graft_o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice")), 4).as("sum_price"))
    }),

    "q17_bloom_join" -> ((s, dir) => {
      // explicit bloom semi-join reduction: urgent-order keys -> 65536-bit
      // md5 bloom -> lineitem pruned before the join; output accounts for
      // the false-positive surplus the oracle recomputes bit-for-bit
      graft.operators.BloomJoin.pruneStats(
        t(s, dir, "lineitem"),
        t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey").as("l_orderkey")),
        "l_orderkey")
    }),

    "q18_quantile_hist" -> ((s, dir) => {
      // oracle-checkable quantile sketch: fixed-width histogram buckets
      // (binWidth = 1000), quantile = first bucket reaching ceil(q*n)
      graft.operators.Sketches.histQuantiles(
        t(s, dir, "orders"), Seq("o_orderpriority"), "o_totalprice",
        binWidth = 1000.0,
        quantiles = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
    }),

    "u4_scd2" -> ((s, dir) => {
      // slowly-changing-dimension type-2 intervals from an ordered
      // change log: valid_from = this change, valid_to = next change of
      // the same key (null = current) — one window shuffle on the key
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("valid_from"),
          lead(col("o_orderdate"), 1).over(w).as("valid_to"))
        .withColumn("is_current", col("valid_to").isNull)
    }),

    "q28_range_frame" -> ((s, dir) => {
      // time-based RANGE frame (q23's ROWS complement): per-customer
      // rolling 7-day spend — the frame is VALUE-bounded (epoch days
      // -6..0), so gap days are skipped and burst days collapse, which
      // a row-count frame cannot express. One key shuffle; partition-
      // local sort only.
      val day = datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("epoch_day"))
        .rangeBetween(-6, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          day.cast("long").as("epoch_day"), col("o_totalprice"))
        .withColumn("spend_7d", round(sum(col("o_totalprice")).over(w), 2))
    }),

    "q30_retention" -> ((s, dir) => {
      // cohort retention (the classic product-analytics matrix): users
      // grouped by first-activity week, retained counts per week offset,
      // rate relative to cohort size. TWO aggregations total — first-seen
      // per user (partial min), then distinct users per (cohort, offset);
      // the cohort join is user-keyed and AQE-broadcastable (one row per
      // user << events).
      val ev = t(s, dir, "events").select(col("user_id"),
        floor(datediff(col("ts").cast("date"),
          lit("2024-01-01").cast("date")) / 7).cast("long").as("wk"))
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(col("wk")).as("cohort_wk"))
      val sizes = cohorts.groupBy(col("cohort_wk"))
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      ev.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk"))
          .as("week_offset"))
        .agg(countDistinct(col("user_id")).as("retained"))
        .join(sizes, Seq("cohort_wk"))
        .withColumn("retention",
          round(col("retained").cast("double") / col("cohort_size"), 5))
    }),

    "u7_compact_files" -> ((s, dir) => {
      // small-file compaction round trip: documents sharded into 32 tiny
      // files, compacted by real byte size with a NO-SHUFFLE coalesce,
      // then audited from the compacted path — if the rewrite dropped,
      // duplicated or corrupted a row the counts/checksums break.
      // OpsSpec separately pins the file-count reduction itself.
      val shards = s"${sys.props("java.io.tmpdir")}/graft-compact-in-" +
        ProcessHandle.current.pid
      val out = s"${sys.props("java.io.tmpdir")}/graft-compact-out-" +
        ProcessHandle.current.pid
      t(s, dir, "documents").repartition(32)
        .write.mode("overwrite").parquet(shards)
      graft.operators.TableOps.compactFiles(s, shards, out,
        targetBytes = 1L << 20)
      s.read.parquet(out)
        .agg(count(lit(1)).as("n"),
          countDistinct(col("doc_id")).as("n_ids"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(length(col("text"))).as("total_chars"),
          sum(conv(substring(md5(col("text")), 1, 7), 16, 10)
            .cast("long")).as("text_md5_sum"))
    }),

    "q29_exact_quantile" -> ((s, dir) => {
      // EXACT per-group quantiles (q18's histogram sketch is the
      // approximate path; this is the ground truth it trades against):
      // sort-based percentile aggregate, one key shuffle, partial-agg
      // collection map-side. Exact quantiles at 100 TB cost a per-group
      // sort — that trade, and when to flip to q18, is the point.
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(c_acctbal, 0.5)"), 4).as("p50"),
          round(expr("percentile(c_acctbal, 0.9)"), 4).as("p90"))
    }),

    "z1_zorder" -> ((s, dir) => {
      // Z-order layout audit: orders keyed by the Morton interleave of
      // (custkey, orderkey); per z-bucket envelope stats show BOTH
      // dimensions range-bounded — the property that makes file-level
      // min/max stats prune on either predicate after a z-sorted write
      import graft.functions.zorder
      val z = zorder.zValue(
        col("o_custkey").bitwiseAND(lit(65535L)),
        col("o_orderkey").bitwiseAND(lit(65535L)))
      t(s, dir, "orders")
        .select(z.as("z"), col("o_custkey"), col("o_orderkey"))
        .groupBy(shiftright(col("z"), 26).as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"),
          max(col("o_custkey")).as("max_cust"),
          min(col("o_orderkey").bitwiseAND(lit(65535L))).as("min_ord"),
          max(col("o_orderkey").bitwiseAND(lit(65535L))).as("max_ord"))
    }),

    "z2_zorder_write" -> ((s, dir) => {
      // the WRITER surface over z1's primitive: orders written
      // z-ordered by (custkey, orderkey) — one range exchange + local
      // sort — then read back from disk and audited with the same
      // per-z-bucket envelope rollup (plus a price checksum, so a
      // writer that dropped/duplicated/corrupted rows breaks the hash).
      // OpsSpec separately pins the file-level property the layout
      // exists for: disjoint per-file z-ranges and min/max pruning on
      // EITHER dimension.
      import graft.functions.zorder
      val out = s"${sys.props("java.io.tmpdir")}/graft-zorder-written-" +
        ProcessHandle.current.pid
      zorder.writeZOrdered(
        t(s, dir, "orders")
          .select("o_custkey", "o_orderkey", "o_totalprice"),
        out, "o_custkey", "o_orderkey")
      val z = zorder.zValue(
        col("o_custkey").bitwiseAND(lit(65535L)),
        col("o_orderkey").bitwiseAND(lit(65535L)))
      s.read.parquet(out)
        .groupBy(shiftright(z, 26).as("z_bucket"))
        .agg(count(lit(1)).as("n"),
          min(col("o_custkey")).as("min_cust"),
          max(col("o_custkey")).as("max_cust"),
          min(col("o_orderkey").bitwiseAND(lit(65535L))).as("min_ord"),
          max(col("o_orderkey").bitwiseAND(lit(65535L))).as("max_ord"),
          round(sum(col("o_totalprice")), 2).as("sum_price"))
    }),

    "u6_table_stats" -> ((s, dir) => {
      // ANALYZE in one pass: row/null counts, min/max, portable-HLL NDV
      // for the CBO-relevant lineitem columns — registers, not values,
      // cross the shuffle
      graft.operators.TableOps.tableStats(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount"))
    }),

    "u12_quality_checks" -> ((s, dir) => {
      // Deequ-style publish gate: PK uniqueness, null fraction, value
      // range (deliberately tight so `passed` = false fires) and FK
      // coverage — four one-row lazy aggregate frames unioned into the
      // verdict report; no driver action inside the operator
      graft.operators.TableOps.qualityChecks(t(s, dir, "lineitem"),
        unique = Seq(Seq("l_orderkey", "l_linenumber")),
        notNull = Seq(("l_returnflag", 0.01)),
        inRange = Seq(("l_quantity", 1.0, 30.0)),
        fk = Seq(("l_orderkey", t(s, dir, "orders"), "o_orderkey")))
    }),

    "u9_table_diff" -> ((s, dir) => {
      // snapshot reconciliation: the after-version is a deterministic
      // perturbation of customer (every 7th key dropped, every 5th
      // balance bumped, a synthetic added block), so all three delta
      // classes fire; ONE keyed full-outer join, unchanged rows drop
      val before = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      val after = before
        .where(pmod(col("c_custkey"), lit(7)) =!= 0)
        .withColumn("c_acctbal",
          when(pmod(col("c_custkey"), lit(5)) === 0,
            round(col("c_acctbal") + 10.5, 2)).otherwise(col("c_acctbal")))
        .unionByName(before.where(pmod(col("c_custkey"), lit(11)) === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            col("c_acctbal"), col("c_mktsegment")))
      graft.operators.TableOps.tableDiff(before, after,
        Seq("c_custkey"), Seq("c_acctbal", "c_mktsegment"))
    }),

    "u11_skew_report" -> ((s, dir) => {
      // the pre-join skew diagnostic: per-key counts reduce map-side,
      // global stats collapse to ONE broadcast row, heavy keys surface
      // via the bounded_top_k heap (k rows per partition cross the
      // final shuffle, never the histogram); suggested_salts feeds q11
      graft.operators.Skew.skewReport(
        t(s, dir, "events").select("user_id"), "user_id", topN = 5)
    }),

    "u10_table_checksum" -> ((s, dir) => {
      // cross-cluster table equality without a sort: per-group row
      // count + two 32-bit XOR folds + one 32-bit sum of the row md5 —
      // commutative partials, four longs per group on the wire
      graft.operators.TableOps.tableChecksum(t(s, dir, "lineitem"),
        Seq("l_returnflag"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_linestatus"))
    }),

    "q36_mode" -> ((s, dir) => {
      // deterministic per-group MODE (most frequent value, ties to the
      // smallest — engine-native mode() leaves ties unspecified, which
      // a cross-engine gate cannot tolerate): two-level aggregation,
      // value counts then ONE windowless arg-min partial agg
      // (min(struct(-count, value)) — the u3/d22 shape, no window sort)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("l_returnflag"))
        .agg(min(struct((-col("_c")).as("nc"),
          col("l_quantity").as("q"))).as("_m"))
        .select(col("l_returnflag"),
          col("_m.q").cast("double").as("mode_quantity"),
          (-col("_m.nc")).cast("long").as("mode_count"))
    }),

    "q31_transitions" -> ((s, dir) => {
      // event-type transition matrix (the Markov view of user journeys):
      // lag window per user (one key shuffle) -> (from, to) counts ->
      // per-from probabilities on the tiny aggregated frame
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .withColumn("from_type", lag(col("event_type"), 1).over(w))
        .where(col("from_type").isNotNull)
        .groupBy(col("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val totals = Window.partitionBy(col("from_type"))
      pairs.withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(totals), 5))
    }),

    "u8_stats_merge" -> ((s, dir) => {
      // incremental ANALYZE: stats states over two disjoint halves of
      // lineitem merged and finalized — the oracle recomputes from the
      // WHOLE table, so the gate IS the merge==full proof (counts and
      // min/max exact, HLL registers max-merge register-for-register)
      import graft.operators.TableOps
      val cols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount")
      val li = t(s, dir, "lineitem")
      val a = TableOps.statsState(
        li.where(pmod(col("l_orderkey"), lit(2)) === 0), cols)
      val b = TableOps.statsState(
        li.where(pmod(col("l_orderkey"), lit(2)) =!= 0), cols)
      TableOps.statsFinalize(TableOps.mergeStatsStates(a, b))
    }),

    "u5_cdc_apply" -> ((s, dir) => {
      // MERGE-style CDC apply: orders read as an I/U/D changelog over
      // the customer snapshot (op derived from order status, LSN =
      // o_orderkey) — u3 compacts a changelog, u4 keeps history, u5
      // produces the new snapshot
      val snap = t(s, dir, "customer")
        .select(col("c_custkey").as("cust_id"),
          col("c_acctbal").as("balance"),
          col("c_mktsegment").as("segment"))
      val changes = t(s, dir, "orders")
        .select(col("o_custkey").as("cust_id"),
          col("o_orderkey").as("seq"),
          when(col("o_orderstatus") === "F", "U")
            .when(col("o_orderstatus") === "O", "I")
            .otherwise("D").as("op"),
          col("o_totalprice").as("balance"),
          concat(lit("seg_"), col("o_orderpriority")).as("segment"))
      graft.operators.TableOps.applyChangelog(snap, changes, "cust_id",
        "op", "seq", Seq("balance", "segment"))
    }),

    "q21_full_outer" -> ((s, dir) => {
      // full outer join surface: nations seen from the customer vs
      // supplier side, neither side dropping unmatched keys
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_customers"))
      val su = t(s, dir, "supplier").groupBy(col("s_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_suppliers"))
      c.join(su, Seq("nk"), "full_outer")
        .select(col("nk").cast("long").as("nationkey"),
          coalesce(col("n_customers"), lit(0L)).as("n_customers"),
          coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
    }),

    "q24_ranks" -> ((s, dir) => {
      // rank-function family over a PARTITIONED window (per segment, so
      // no global sort / single reducer): ntile, percent_rank, dense_rank
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, dir, "customer").select(col("c_mktsegment"), col("c_custkey"),
        col("c_acctbal"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 5).as("pct_rank"),
        dense_rank().over(w).cast("long").as("drank"))
    }),

    "q25_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS (finer than rollup/cube) + grouping_id
      t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql("""SELECT l_returnflag, l_linestatus,
        count(*) AS n_rows,
        CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
          (l_returnflag, l_linestatus))""")
    }),

    "q32_cube" -> ((s, dir) => {
      // CUBE completes the multi-dimensional aggregate trio next to
      // ROLLUP (q6) and explicit GROUPING SETS (q25): all 2^k margin
      // combinations in ONE pass — Spark expands the sets map-side and
      // shares the single hash-aggregate exchange; gid disambiguates
      // a margin row from a genuinely-null group value
      t(s, dir, "lineitem")
        .withColumn("ship_year", year(col("l_shipdate")).cast("long"))
        .cube(col("l_returnflag"), col("ship_year"))
        .agg(round(sum(col("l_quantity")), 4).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          grouping_id().cast("long").as("gid"))
    }),

    "q20_setops" -> ((s, dir) => {
      // INTERSECT / EXCEPT surface: customers ordering in both 1995 and
      // 1996 (retained) vs only 1995 (churned) — both distinct-set ops
      // compile to aggregate + shuffle on the key, no row explosion
      val o = t(s, dir, "orders")
      def buyers(yr: Int) = o
        .where(year(col("o_orderdate")) === yr)
        .select(col("o_custkey"))
      val retained = buyers(1995).intersect(buyers(1996))
        .withColumn("cohort", lit("retained"))
      val churned = buyers(1995).except(buyers(1996))
        .withColumn("cohort", lit("churned"))
      retained.unionByName(churned)
        .groupBy(col("cohort"))
        .agg(count(lit(1)).as("n_customers"))
    }),

    "q10_range_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("order_month"))
        .agg(round(sum(col("o_totalprice")), 4).as("monthly_revenue"),
          count(lit(1)).as("n_orders"))
    })
  )

  /** Per-column stats block for the u6 oracle: base aggregates + the
    * q15 md5-register HLL estimate, replayed per column.
    */
  private def statsSql(c: String): String =
    s"""SELECT column_name, n_rows, null_count, min_val, max_val,
       |  round(CASE WHEN raw <= 640.0 AND zeros > 0
       |    THEN 256.0 * ln(256.0 / zeros::DOUBLE) ELSE raw END, 4)
       |    AS ndv_est
       |FROM (
       |  SELECT '$c' AS column_name, count(*) AS n_rows,
       |    count(*) - count($c) AS null_count,
       |    round(min(CAST($c AS DOUBLE)), 6) AS min_val,
       |    round(max(CAST($c AS DOUBLE)), 6) AS max_val
       |  FROM lineitem),
       |(
       |  SELECT (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
       |      / (sp + (256 - cnt)::DOUBLE) AS raw,
       |    256 - cnt AS zeros
       |  FROM (
       |    SELECT count(*) AS cnt, sum(pow(2.0, -r)) AS sp FROM (
       |      SELECT idx, max(CASE WHEN rest = 0 THEN 25
       |          ELSE 25 - length(bin(rest)) END) AS r
       |      FROM (
       |        SELECT
       |          list_reduce([strpos('0123456789abcdef',
       |              substr(md5(CAST($c AS VARCHAR)), j, 1)) - 1
       |            for j in range(1, 3)], (a, b) -> a * 16 + b) AS idx,
       |          list_reduce([strpos('0123456789abcdef',
       |              substr(md5(CAST($c AS VARCHAR)), j, 1)) - 1
       |            for j in range(3, 9)], (a, b) -> a * 16 + b) AS rest
       |        FROM lineitem WHERE $c IS NOT NULL)
       |      GROUP BY 1)))""".stripMargin

  // the same 16-bit Morton interleave as graft.functions.zorder.zValue,
  // unrolled to literal shifts for DuckDB
  private val zorderSql: String = (0 until 16).map { i =>
    s"(((o_custkey & 65535) >> $i) & 1) * ${1L << (2 * i)} + " +
      s"(((o_orderkey & 65535) >> $i) & 1) * ${1L << (2 * i + 1)}"
  }.mkString(" + ")

  val oracles: Map[String, String] = Map(
    "q30_retention" ->
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST(floor(datediff('day', DATE '2024-01-01',
        |      CAST(ts AS DATE)) / 7) AS BIGINT) AS wk
        |  FROM events),
        |c AS (SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY 1),
        |s AS (SELECT cohort_wk, count(DISTINCT user_id) AS cohort_size
        |      FROM c GROUP BY 1),
        |r AS (
        |  SELECT c.cohort_wk, ev.wk - c.cohort_wk AS week_offset,
        |    count(DISTINCT ev.user_id) AS retained
        |  FROM ev JOIN c USING (user_id) GROUP BY 1, 2)
        |SELECT r.cohort_wk, r.week_offset, r.retained, s.cohort_size,
        |  round(r.retained::DOUBLE / s.cohort_size, 5) AS retention
        |FROM r JOIN s USING (cohort_wk)""".stripMargin,

    "q28_range_frame" ->
"""SELECT o_custkey, o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |    AS epoch_day,
        |  o_totalprice,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS spend_7d
        |FROM orders""".stripMargin,

    // compaction audit recomputed from the SOURCE table: a lossy rewrite
    // cannot match counts/ids/chars/md5-checksum
    "u7_compact_files" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id,
        |  CAST(sum(len(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(list_reduce([strpos('0123456789abcdef',
        |      substr(md5(text), j, 1)) - 1
        |    for j in range(1, 8)], (a, c) -> a * 16 + c)) AS BIGINT)
        |    AS text_md5_sum
        |FROM documents""".stripMargin,

    "u11_skew_report" ->
      """WITH c AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS tot,
        |    CAST(count(*) AS BIGINT) AS nk
        |  FROM c),
        |top AS (
        |  SELECT user_id, n,
        |    row_number() OVER (ORDER BY n DESC, user_id ASC) AS rank
        |  FROM c ORDER BY n DESC, user_id ASC LIMIT 5)
        |SELECT t.user_id, CAST(t.rank AS BIGINT) AS rank, t.n AS n_rows,
        |  round(t.n / (st.tot / st.nk), 4) AS skew,
        |  CAST(ceil(t.n / (st.tot / st.nk)) AS BIGINT)
        |    AS suggested_salts
        |FROM top t, st""".stripMargin,

    "u10_table_checksum" ->
      """WITH h AS (
        |  SELECT l_returnflag, md5(concat_ws('|',
        |    coalesce(CAST(l_orderkey AS VARCHAR), '∅'),
        |    coalesce(CAST(l_partkey AS VARCHAR), '∅'),
        |    coalesce(CAST(l_suppkey AS VARCHAR), '∅'),
        |    coalesce(CAST(l_linenumber AS VARCHAR), '∅'),
        |    coalesce(l_linestatus, '∅'))) AS hh
        |  FROM lineitem),
        |v AS (
        |  SELECT l_returnflag,
        |    list_reduce([strpos('0123456789abcdef', substr(hh, j, 1)) - 1
        |      for j in range(1, 9)], (a, c) -> a * 16 + c) AS v1,
        |    list_reduce([strpos('0123456789abcdef', substr(hh, j, 1)) - 1
        |      for j in range(9, 17)], (a, c) -> a * 16 + c) AS v2
        |  FROM h)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(bit_xor(v1) AS BIGINT) AS xor1,
        |  CAST(bit_xor(v2) AS BIGINT) AS xor2,
        |  CAST(sum(v1) AS BIGINT) AS sum1
        |FROM v GROUP BY 1""".stripMargin,

    // Spark's percentile == linear interpolation == quantile_cont
    "q29_exact_quantile" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
        |  round(quantile_cont(c_acctbal, 0.9), 4) AS p90
        |FROM customer GROUP BY 1""".stripMargin,

    "z1_zorder" ->
      s"""WITH z0 AS (
         |  SELECT ($zorderSql) AS z, o_custkey, o_orderkey FROM orders)
         |SELECT z >> 26 AS z_bucket, count(*) AS n,
         |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
         |  min(o_orderkey & 65535) AS min_ord,
         |  max(o_orderkey & 65535) AS max_ord
         |FROM z0 GROUP BY 1""".stripMargin,

    // z2 re-derives the audit from the SOURCE table: if the z-ordered
    // writer dropped, duplicated, or corrupted any row on the way to
    // disk, the counts/envelopes/checksum can't match
    "z2_zorder_write" ->
      s"""WITH z0 AS (
         |  SELECT ($zorderSql) AS z, o_custkey, o_orderkey, o_totalprice
         |  FROM orders)
         |SELECT z >> 26 AS z_bucket, count(*) AS n,
         |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust,
         |  min(o_orderkey & 65535) AS min_ord,
         |  max(o_orderkey & 65535) AS max_ord,
         |  round(sum(o_totalprice), 2) AS sum_price
         |FROM z0 GROUP BY 1""".stripMargin,

    "u9_table_diff" ->
      """WITH b AS (
        |  SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        |a AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 5 = 0 THEN round(c_acctbal + 10.5, 2)
        |      ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM b WHERE c_custkey % 7 <> 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, c_acctbal, c_mktsegment
        |  FROM b WHERE c_custkey % 11 = 0),
        |j AS (
        |  SELECT coalesce(b.c_custkey, a.c_custkey) AS c_custkey,
        |    b.c_custkey IS NOT NULL AS hb,
        |    a.c_custkey IS NOT NULL AS ha,
        |    array_to_string(list_sort([x FOR x IN [
        |      CASE WHEN b.c_acctbal IS DISTINCT FROM a.c_acctbal
        |        THEN 'c_acctbal' END,
        |      CASE WHEN b.c_mktsegment IS DISTINCT FROM a.c_mktsegment
        |        THEN 'c_mktsegment' END] IF x IS NOT NULL]), ';') AS cc
        |  FROM b FULL OUTER JOIN a ON b.c_custkey = a.c_custkey),
        |r AS (
        |  SELECT c_custkey,
        |    CASE WHEN NOT hb THEN 'added'
        |         WHEN NOT ha THEN 'removed'
        |         WHEN cc <> '' THEN 'changed'
        |         ELSE 'unchanged' END AS status,
        |    cc FROM j)
        |SELECT c_custkey, status,
        |  CASE WHEN status = 'changed' THEN cc END AS changed_cols
        |FROM r WHERE status <> 'unchanged'""".stripMargin,

    "q36_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, l_quantity, count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |m AS (
        |  SELECT l_returnflag,
        |    min(struct_pack(nc := -c, q := l_quantity)) AS m
        |  FROM c GROUP BY 1)
        |SELECT l_returnflag, CAST(m.q AS DOUBLE) AS mode_quantity,
        |  CAST(-m.nc AS BIGINT) AS mode_count
        |FROM m""".stripMargin,

    "q31_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM events),
        |c AS (
        |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE)
        |    / sum(n) OVER (PARTITION BY from_type), 5) AS p
        |FROM c""".stripMargin,

    "u12_quality_checks" ->
      """SELECT 'unique' AS "check",
        |  'l_orderkey,l_linenumber' AS "column",
        |  CAST(m AS DOUBLE) AS metric, CAST(0.0 AS DOUBLE) AS threshold,
        |  m = 0 AS passed
        |FROM (SELECT coalesce(sum(c), 0) AS m FROM (
        |  SELECT count(*) AS c FROM lineitem
        |  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
        |UNION ALL
        |SELECT 'not_null', 'l_returnflag',
        |  round(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
        |    / count(*), 6),
        |  CAST(0.01 AS DOUBLE),
        |  round(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
        |    / count(*), 6) <= CAST(0.01 AS DOUBLE)
        |FROM lineitem
        |UNION ALL
        |SELECT 'in_range', 'l_quantity', CAST(m AS DOUBLE),
        |  CAST(0.0 AS DOUBLE), m = 0
        |FROM (SELECT sum(CASE WHEN l_quantity < CAST(1.0 AS DOUBLE)
        |    OR l_quantity > CAST(30.0 AS DOUBLE) THEN 1 ELSE 0 END)
        |  AS m FROM lineitem)
        |UNION ALL
        |SELECT 'fk', 'l_orderkey', CAST(m AS DOUBLE),
        |  CAST(0.0 AS DOUBLE), m = 0
        |FROM (SELECT count(*) AS m FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_orderkey = l.l_orderkey))""".stripMargin,

    "u6_table_stats" ->
Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .map(statsSql).mkString("", "\nUNION ALL\n", ""),

    // u8's oracle is the FULL-table recompute — the merged-halves gate
    // result must equal it, which is the mergeability proof
    "u8_stats_merge" ->
      Seq("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
        .map(statsSql).mkString("", "\nUNION ALL\n", ""),

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q2_join_broadcast" ->
      """SELECT r_name, n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q3_topk" ->
      """WITH rev AS (
        |  SELECT p_brand, p_partkey, round(sum(l_extendedprice), 4) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_brand, p_partkey, revenue, rnk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY p_brand
        |    ORDER BY revenue DESC, p_partkey) AS rnk FROM rev)
        |WHERE rnk <= 3""".stripMargin,

    "q4_filter_pushdown" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_discount
        |FROM lineitem WHERE l_quantity > 45 AND l_discount >= 0.05""".stripMargin,

    "u4_scd2" ->
      """SELECT o_custkey, o_orderkey, o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |  lead(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
        |FROM orders""".stripMargin,

    "u5_cdc_apply" ->
      """WITH latest AS (
        |  SELECT * FROM (
        |    SELECT o_custkey AS cust_id,
        |      CASE WHEN o_orderstatus = 'F' THEN 'U'
        |           WHEN o_orderstatus = 'O' THEN 'I' ELSE 'D' END AS op,
        |      o_totalprice AS balance,
        |      'seg_' || o_orderpriority AS segment,
        |      row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1),
        |s AS (SELECT c_custkey AS cust_id, c_acctbal AS balance,
        |    c_mktsegment AS segment FROM customer)
        |SELECT coalesce(s.cust_id, l.cust_id) AS cust_id,
        |  CASE WHEN l.cust_id IS NOT NULL THEN l.balance
        |       ELSE s.balance END AS balance,
        |  CASE WHEN l.cust_id IS NOT NULL THEN l.segment
        |       ELSE s.segment END AS segment
        |FROM s FULL OUTER JOIN latest l ON s.cust_id = l.cust_id
        |WHERE l.op IS NULL OR l.op <> 'D'""".stripMargin,

    "q21_full_outer" ->
      """SELECT coalesce(c.nk, s.nk) AS nationkey,
        |  coalesce(c.n_customers, 0) AS n_customers,
        |  coalesce(s.n_suppliers, 0) AS n_suppliers
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_customers
        |      FROM customer GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk, count(*) AS n_suppliers
        |      FROM supplier GROUP BY 1) s
        |  ON c.nk = s.nk""".stripMargin,

    "q24_ranks" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 5) AS pct_rank,
        |  dense_rank() OVER w AS drank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment
        |  ORDER BY c_acctbal DESC, c_custkey)""".stripMargin,

    "q25_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
        |  CAST(grouping(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |  (l_returnflag, l_linestatus))""".stripMargin,

    "q32_cube" ->
      """SELECT l_returnflag, ship_year,
        |  round(sum(l_quantity), 4) AS sum_qty, count(*) AS n_rows,
        |  CAST(grouping(l_returnflag, ship_year) AS BIGINT) AS gid
        |FROM (SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT)
        |    AS ship_year, l_quantity FROM lineitem)
        |GROUP BY CUBE(l_returnflag, ship_year)""".stripMargin,

    "q20_setops" ->
      """WITH y95 AS (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
        |y96 AS (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |cohorts AS (
        |  SELECT o_custkey, 'retained' AS cohort
        |  FROM (SELECT o_custkey FROM y95 INTERSECT
        |        SELECT o_custkey FROM y96)
        |  UNION ALL
        |  SELECT o_custkey, 'churned' AS cohort
        |  FROM (SELECT o_custkey FROM y95 EXCEPT
        |        SELECT o_custkey FROM y96))
        |SELECT cohort, count(*) AS n_customers
        |FROM cohorts GROUP BY 1""".stripMargin,

    "q18_quantile_hist" ->
      """WITH h AS (
        |  SELECT o_orderpriority, CAST(floor(o_totalprice / 1000.0)
        |    AS BIGINT) AS b, count(*) AS c
        |  FROM orders GROUP BY 1, 2),
        |cum AS (
        |  SELECT o_orderpriority, b, c,
        |    sum(c) OVER (PARTITION BY o_orderpriority ORDER BY b
        |      ROWS UNBOUNDED PRECEDING) AS cm,
        |    sum(c) OVER (PARTITION BY o_orderpriority) AS total
        |  FROM h)
        |SELECT o_orderpriority,
        |  min(CASE WHEN cm >= ceil(0.5 * total) THEN b END) * 1000.0
        |    AS p50,
        |  min(CASE WHEN cm >= ceil(0.9 * total) THEN b END) * 1000.0
        |    AS p90,
        |  min(CASE WHEN cm >= ceil(0.99 * total) THEN b END) * 1000.0
        |    AS p99
        |FROM cum GROUP BY 1""".stripMargin,

    "q17_bloom_join" ->
      """WITH dim AS (
        |  SELECT DISTINCT o_orderkey AS k FROM orders
        |  WHERE o_orderpriority = '1-URGENT'),
        |bits AS (
        |  SELECT DISTINCT unnest([
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(j AS VARCHAR) || ':'
        |          || CAST(k AS VARCHAR)), p, 1)) - 1
        |      for p in range(1, 8)], (a, c) -> a * 16 + c) % 65536
        |    for j in range(0, 3)]) AS bit
        |  FROM dim),
        |fk AS (
        |  SELECT k, list_distinct([
        |    list_reduce([strpos('0123456789abcdef',
        |        substr(md5(CAST(j AS VARCHAR) || ':'
        |          || CAST(k AS VARCHAR)), p, 1)) - 1
        |      for p in range(1, 8)], (a, c) -> a * 16 + c) % 65536
        |    for j in range(0, 3)]) AS ps
        |  FROM (SELECT DISTINCT l_orderkey AS k FROM lineitem)),
        |kp AS (SELECT k, len(ps) AS n, unnest(ps) AS bit FROM fk),
        |cand AS (
        |  SELECT k FROM kp JOIN bits USING (bit)
        |  GROUP BY k, n HAVING count(*) = n),
        |agg AS (
        |  SELECT
        |    (SELECT count(*) FROM lineitem) AS n_fact,
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey IN (SELECT k FROM cand)) AS n_candidates,
        |    (SELECT count(*) FROM lineitem
        |     WHERE l_orderkey IN (SELECT k FROM dim)) AS n_true)
        |SELECT CAST(n_fact AS BIGINT) AS n_fact,
        |  CAST(n_candidates AS BIGINT) AS n_candidates,
        |  CAST(n_true AS BIGINT) AS n_true,
        |  CAST(n_candidates - n_true AS BIGINT) AS n_false_pos
        |FROM agg""".stripMargin,

    "q5_semi_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
        |  'with_orders' AS kind
        |FROM customer WHERE EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1
        |UNION ALL
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  'without_orders' AS kind
        |FROM customer WHERE NOT EXISTS
        |  (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1""".stripMargin,

    "q6_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 4) AS sum_price,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q7_window" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), 4) AS running_total,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey) AS order_seq
        |FROM orders""".stripMargin,

    "q8_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q9_skewjoin" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // bucketing must not change the join result: same oracle as q9
    "q12_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // salting must not change the join result: same oracle as q9
    "q11_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  round(sum(l_extendedprice), 4) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q10_range_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  round(sum(o_totalprice), 4) AS monthly_revenue,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1""".stripMargin
  )
}
