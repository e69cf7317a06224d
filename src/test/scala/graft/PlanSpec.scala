package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Physical-plan assertions: the optimizations the 100 TB design relies on
  * must actually appear in `explain` output — filter/column pushdown into
  * the parquet scan, broadcast joins for dims, whole-stage codegen.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("plan-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize the adaptive plan so codegen stages appear
    df.queryExecution.executedPlan.toString
  }

  test("q4 filter and projection push into the parquet scan") {
    val p = plan("q4_filter_pushdown")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_quantity"), p)
    // column pruning: only the 4 selected columns in ReadSchema
    val readSchema = p.split("ReadSchema:")(1).split("\n")(0)
    assert(!readSchema.contains("l_comment"), readSchema)
    assert(readSchema.contains("l_orderkey"), readSchema)
  }

  test("q12 bucketed join has no exchange on either join side") {
    // disable auto-broadcast so the join exercises the bucketed
    // co-location (at real scale neither side broadcasts)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val p = plan("q12_bucketed_join")
      assert(p.contains("SortMergeJoin"), p)
      // both scans read bucketed data directly
      assert("Bucketed: true".r.findAllIn(p).size >= 2, p)
      // the join subtree (final plan, down to the scans) has no exchange;
      // cut before the echoed "Initial Plan" section, which legitimately
      // shows the aggregation's own shuffle
      val joinPart = p.split("SortMergeJoin")(1)
        .split("== Initial Plan ==")(0)
      assert(!joinPart.contains("Exchange hashpartitioning"), p)
    } finally spark.conf.set(key, prev)
  }

  test("q2 star join broadcasts the dimension tables") {
    val p = plan("q2_join_broadcast")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p)
  }

  test("q1 aggregation uses whole-stage codegen and partial aggregation") {
    val p = plan("q1_agg")
    assert(p.contains("*("), p) // '*' prefix = whole-stage codegen stage
    assert(p.contains("partial_"), p) // map-side combine
  }

  test("interval join stays an equi-join (no cartesian product)") {
    import graft.operators.IntervalJoin
    val points = spark.range(100).select(col("id").as("pos"),
      lit("1").as("chrom"))
    val ivals = spark.range(10).select((col("id") * 10).as("start"),
      (col("id") * 10 + 9).as("end"), lit("1").as("chrom"))
    val p = IntervalJoin.pointsInIntervals(points, ivals, Seq("chrom"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("interval join refuses to run without a partition key") {
    import graft.operators.IntervalJoin
    val points = spark.range(10).select(col("id").as("pos"))
    val ivals = spark.range(2).select(col("id").as("start"),
      (col("id") + 5).as("end"))
    val e = intercept[IllegalArgumentException] {
      IntervalJoin.pointsInIntervals(points, ivals, Seq.empty)
    }
    assert(e.getMessage.contains("partition key"))
  }

  test("knnCosine runs the bounded top-k heap MAP-SIDE (partial agg)") {
    import graft.operators.Similarity
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = emb.where(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val p = Similarity.knnCosine(q, c, 3).queryExecution.executedPlan
      .toString
    // the native aggregate must appear in partial mode BEFORE the shuffle:
    // each map task ships at most k rows per query
    assert(p.contains("partial_bounded_top_k"), p)
    // and the shuffle key is the query id, not a global window
    assert(!p.contains("Window"), p)
  }

  test("peptide match broadcasts peptides — the k-mer index never shuffles") {
    import graft.operators.PeptideAnnotate
    val s2 = spark
    import s2.implicits._
    val prots = Seq(("P1", "MKVLAARTW"), ("P2", "AARTWKV"))
      .toDF("accession", "sequence")
    val peps = Seq(("q1", "AART"), ("q2", "KVLA")).toDF("pepId", "peptide")
    val df = PeptideAnnotate.matchPeptides(peps, prots, k = 4)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // candidate generation must be a broadcast join probing the index
    // stream-side; a shuffle of the positional index (rows ~ total
    // sequence length) is exactly what broadcastPeptides avoids
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("PageRank default path map-side-combines contributions (partial_sum)") {
    import graft.operators.PageRank
    val s2 = spark
    import s2.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id1", "id2")
    val fwd = pairs.select(col("id1").as("src"), col("id2").as("dst"))
    val edges = fwd.union(
      fwd.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = degrees.select(count(lit(1)).as("_n"))
    val r0 = degrees.crossJoin(broadcast(n))
      .select(col("src").as("node"), col("_n"),
        round(lit(1.0) / col("_n"), 8).as("rank"))
    val p = PageRank.iterate(edges, degrees, r0, 0.85, exactFold = false)
      .queryExecution.executedPlan.toString
    // hub-safe: the per-node Σ must run as a partial aggregate before the
    // shuffle (one double per map partition), never a collect_list fold
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("collect_list"), p)
    // and ranks() itself runs green on the default (inexact) path
    assert(PageRank.ranks(pairs, iters = 2).count() == 3)
  }

  test("q17 bloom pruning reads the fact table in two key-only scans") {
    val p = plan("q17_bloom_join")
    // two scans: per-key row counts + the distinct keys the bloom tests
    // (a third+ means the old semi-join-count shape crept back; one
    // fused chain measured 13x slower — see BloomJoin.pruneStats). AQE
    // prints reused subtrees in full, so count distinct scan output
    // ids, not printed lines.
    val scans = p.split("\n")
      .filter(l => l.contains("FileScan parquet") && l.contains("lineitem"))
    val scanIds = scans.flatMap("#\\d+".r.findFirstIn(_)).distinct
    assert(scanIds.length <= 2, p)
    // and both scans are key-only — pruning reached the reader
    assert(scans.forall(_.contains("ReadSchema: struct<l_orderkey")), p)
  }

  test("q13 stratified sample is a scan-level predicate — zero shuffles") {
    val p = plan("q13_stratified_sample")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("*(1) Filter"), p) // codegen'd, directly on the scan
  }

  test("e19 stream sampling is a scan-level predicate — zero shuffles") {
    val p = plan("e19_stream_sample")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Filter"), p)
  }

  test("u10 table checksum: ONE hash exchange, folds partial-aggregate " +
    "map-side") {
    // AQE toString repeats the plan under "== Initial Plan ==" — count
    // exchanges in the final section only
    val p = plan("u10_table_checksum").split("== Initial Plan ==").head
    assert(p.split("Exchange hashpartitioning").length - 1 == 1, p)
    // partial_count/partial_bit_xor/partial_sum before the exchange —
    // four longs per group cross the wire, never rows
    assert(p.contains("partial_bit_xor"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Sort "), p) // order-independence needs no sort
  }

  test("w5 host policy: one host-keyed exchange, no join in the stats " +
    "pass") {
    val p = plan("w5_host_stats")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // countDistinct expands to a two-phase aggregate over the SAME key
    // prefix — distinct-expand exchanges allowed, corpus-wide sorts not
    assert(!p.contains("rangepartitioning"), p)
  }

  test("s7 exact range search is shuffle-free — score and filter map-side") {
    val p = plan("s7_range_search")
    // the only exchange is the broadcast of the tiny query side; the
    // corpus is scanned once and never hash-repartitioned (there is no
    // per-query reduction to converge, unlike top-k)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("e5 interval correlate keys on user_id — never a cross product") {
    val p = plan("e5_stream_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the equi-key carries the join; the time horizon is the residual
    assert(p.contains("user_id"), p)
  }

  test("t7 packing shuffles once, by the shard key only") {
    val p = plan("t7_seq_pack")
    // window by shard + rollup by (shard, chunk) — AQE may coalesce, but
    // nothing in the plan may sort or partition globally (no global order
    // = shards parallelize at any corpus size)
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("q14 as-of join: ONE key shuffle, no range-condition join") {
    val p = plan("q14_asof_join")
    // the union+window rewrite must not degrade to any join operator
    assert(!p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly one data shuffle, keyed on user_id (dedup of right-side
    // (key,ts) duplicates rides the same window — no second exchange)
    val exchanges = "Exchange hashpartitioning\\(user_id"
      .r.findAllIn(p.split("== Initial Plan ==")(0)).size
    assert(exchanges == 1, p)
  }

  test("u3 changelog compaction is a windowless partial-agg arg-max") {
    val p = plan("u3_compact_latest")
    // the struct max must partially aggregate map-side — one row per key
    // per map task crosses the shuffle; a row_number plan would need a
    // Window over each whole partition. (SortAggregate's partition-LOCAL
    // sorts are fine; what must not appear is a global/range sort.)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_max"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("u5 changelog apply: windowless compaction + one key join, " +
    "no range sort") {
    val p = plan("u5_cdc_apply")
    // same economics as u3 (partial-agg arg-max compaction), then a
    // single key-equi full outer join — never a window or global sort
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_max"), p)
    assert(!p.contains("rangepartitioning"), p)
    assert(p.contains("FullOuter") || p.contains("full_outer"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s8 MIPS top-k: broadcast queries, bounded_top_k partial agg, " +
    "single reduction shuffle") {
    val p = plan("s8_dot_topk")
    // the corpus is scanned once and never hash-repartitioned before
    // scoring; the only hash exchange carries <= k rows per query from
    // the partial bounded_top_k
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("bounded_top_k"), p)
    // count in the FINAL plan only (AQE echoes the initial plan below it)
    val finalPlan = p.split("Initial Plan")(0)
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size <= 1,
      finalPlan)
  }

  test("g5 nearest-interval join stays a binned equi-join with a " +
    "partial-agg arg-min") {
    val p = plan("g5_nearest_join")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // winner selection is the partial-aggregable min(struct), no window
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_min"), p)
  }

  test("e15 streaming-ingest assignment never hash-shuffles the vector " +
    "side") {
    val p = plan("e15_stream_assign")
    val finalPlan = p.split("Initial Plan")(0)
    // the only exchange is the tiny codebook's collapse to one array row
    // (SinglePartition on <n_centroids> rows) + its broadcast; vectors
    // are scored and assigned entirely map-side — the property that
    // makes the same call valid on an unbounded stream
    assert(!finalPlan.contains("Exchange hashpartitioning"), finalPlan)
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e7 resample: grid and fill never degrade to a cross product") {
    val p = plan("e7_resample")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q17 bloom bit set reaches the probe side via broadcast") {
    val p = plan("q17_bloom_join")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("s4 PQ encoding argmin partial-aggregates map-side") {
    val p = plan("s4_pq_ann")
    assert(p.contains("partial_bounded_top_k"), p)
    assert(!p.contains("Window"), p)
  }

  test("d8 CDC chunking never sorts or partitions globally") {
    val p = plan("d8_cdc_dedup")
    assert(!p.contains("rangepartitioning"), p)
    assert(!p.contains("SinglePartition, ENSURE"), p)
  }

  test("t9 BM25 corpus stats broadcast back — corpus never shuffles") {
    val p = plan("t9_bm25")
    // stats (one row) join the per-doc scores via broadcast NL join
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    // the only hash exchange is the k-row bounded_top_k reduce, never a
    // hashpartitioning of doc rows on a data column
    assert(!p.contains("hashpartitioning(doc_id"), p)
    assert(p.contains("partial_bounded_top_k"), p)
  }

  test("s6 IVF-PQ: codebook joins broadcast, candidates join by hash — " +
    "no cartesian product anywhere") {
    val p = plan("s6_ivfpq_ann")
    // the only nested-loop joins are the broadcast tiny-codebook scans;
    // a CartesianProduct would mean a corpus x corpus (or corpus x
    // query) blow-up that cannot survive at scale
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    // candidate scoring reaches the corpus through hash joins on the
    // list/vector ids, with the bounded top-k partial-aggregated
    assert(p.contains("partial_bounded_top_k"), p)
  }

  test("d15 semantic dedup: centroid joins broadcast, pair generation " +
    "keys on the cluster — no cartesian product") {
    val p = plan("d15_semdedup")
    // the only nested-loop joins are broadcast tiny-centroid scans; a
    // CartesianProduct would be a corpus x corpus blow-up
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    // assignment ships at most one (id, cluster) row per vector per map
    // task into the shuffle
    assert(p.contains("partial_bounded_top_k"), p)
  }

  test("e11 ingest dedup joins the corpus index by broadcast — the " +
    "arriving batch's shingle arrays never cross a shuffle") {
    val p = plan("e11_stream_ingest")
    // the stream-static bucket join must broadcast (one side is the
    // skew-capped index; on a stream the arriving side cannot shuffle
    // without breaking the stateless per-micro-batch contract)
    assert(p.contains("BroadcastHashJoin"), p)
    // the shingle array column (sh1) rides the explode in-memory only:
    // no hash exchange may partition on it or carry it as a join key
    assert(!p.contains("hashpartitioning(sh1"), p)
  }

  test("e11 streaming mode: the per-micro-batch plan has NO aggregation " +
    "and no window — the index skew cap is precomputed at build time") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate,
      Window => LWindow}
    val corpus = spark.range(20).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha beta gamma delta"),
        col("id").cast("string")).as("text"))
    // capIndex runs at index-build time; the checkpoint stands in for the
    // persisted parquet the production ingest gate would read
    val idx = graft.operators.Dedup.capIndex(graft.operators.Dedup
      .minhashBuckets(corpus, "doc_id", "text")).localCheckpoint()
    val stream = spark.readStream.format("rate")
      .option("rowsPerSecond", "1").load()
      .select(col("value").as("doc_id"),
        lit("alpha beta gamma delta five").as("text"),
        col("timestamp").as("ts"))
    val out = graft.streaming.StreamDedup.ingestDedup(stream, corpus, idx,
      "doc_id", "text", watermark = Some(("ts", "10 minutes")))
    // analyzed, not optimized: a streaming frame can't run the batch
    // optimizer path, and Aggregate/Window nodes are present (or absent)
    // from analysis already — nothing later introduces one
    val lp = out.queryExecution.analyzed
    assert(lp.collect { case a: Aggregate => a }.isEmpty,
      s"streaming ingest plan re-aggregates per micro-batch:\n$lp")
    assert(lp.collect { case w: LWindow => w }.isEmpty,
      s"streaming ingest plan contains a window pass:\n$lp")
  }

  test("z2 z-ordered write is ONE range exchange + partition-local sort") {
    import graft.functions.zorder
    val df = zorder.zOrdered(
      spark.read.parquet(s"$sf/orders.parquet"), "o_custkey",
      "o_orderkey", numFiles = 4)
    val p = df.queryExecution.executedPlan.toString
    // exactly one exchange, and it is RANGE (balanced z-intervals), not
    // hash; the sort is partition-local (global=false), so no second
    // total-ordering exchange sneaks in
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert("Sort \\[".r.findAllIn(p).size == 1, p)
    assert(p.contains("global=false") || p.contains("], false, 0"), p)
  }

  test("s9 rerank gathers candidate vectors by BROADCAST — the corpus " +
    "never shuffles for stage 2") {
    val p = plan("s9_rerank")
    val finalPlan = p.split("Initial Plan")(0)
    assert(!p.contains("CartesianProduct"), p)
    // stage 1 (IVF-PQ) contributes its one bounded_top_k reduction per
    // sub-step; stage 2's candidate gather must appear as a broadcast
    // hash join against the corpus scan, never a corpus repartition
    assert(finalPlan.contains("BroadcastHashJoin") ||
      finalPlan.contains("BroadcastExchange"), finalPlan)
    assert(p.contains("bounded_top_k"), p)
  }

  test("g9 flagstat: one partial-aggregated pass — 12 longs cross the " +
    "exchange, never read rows") {
    graft.fixtures.GenomicFixtures.ensure(spark)
    val p = plan("g9_flagstat")
    // map-side partial aggregation collapses every scan task to one row
    // of counters before the single-partition exchange
    assert(p.contains("partial_sum") || p.contains("Partial"), p)
    // no hash exchange on a data column — the only shuffle is the
    // 1-row final-aggregate gather
    assert(!p.contains("hashpartitioning(qname"), p)
    assert(!p.contains("hashpartitioning(rname"), p)
  }

  test("g11 mendel: the trio table joins by BROADCAST — the genotype " +
    "matrix is never on the small side") {
    graft.fixtures.GenomicFixtures.ensure(spark)
    val p = plan("g11_mendel")
    assert(p.contains("BroadcastHashJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("t21/t25/t23 URL canonicalization, boilerplate strip and BPE " +
    "encode run with ZERO exchanges — one projection over the scan") {
    for (name <- Seq("t21_url_normalize", "t25_boilerplate",
      "t23_bpe_encode")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name shuffles:\n$p")
      // '*(n)' is executedPlan.toString's whole-stage-codegen marker
      // (the scan side codegens; the array-lambda subtrees evaluate as
      // interpreted expressions inside the same single pass)
      assert(p.contains("*("), s"$name has no codegen stage:\n$p")
    }
  }

  test("m6 phash pairs: no dedup pass — ownership is an inline filter, " +
    "and the only aggregation is the skew-cap window") {
    graft.fixtures.GenomicFixtures.ensure(spark)
    val df = graft.operators.Multimodal.phashPairs(
      spark.read.parquet(s"${graft.fixtures.GenomicFixtures.dir}" +
        "/images_phash.parquet"), "media_id")
    df.collect()
    val lp = df.queryExecution.analyzed
    // no Distinct/groupBy dedup of pairs anywhere in the logical plan —
    // first-shared-band ownership makes each pair unique at emission
    assert(lp.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.isEmpty, s"pair dedup aggregation found:\n$lp")
    assert(lp.collect {
      case d: org.apache.spark.sql.catalyst.plans.logical.Distinct => d
    }.isEmpty, s"distinct found:\n$lp")
  }


  test("g16 HWE is one partial-aggregated pass — no window, no join") {
    val p = plan("g16_hwe")
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), "HWE must not join")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "map-side partials must feed the exchange")
  }

  test("t24 shuffle rank: offsets broadcast back, no global sort of " +
    "the corpus") {
    val p = plan("t24_shuffle_rank")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      "bucket offsets must reach rows by broadcast:\n" + p)
    // the corpus-wide window partitions by bucket — a global rank via
    // one partition would show an empty partition spec / SinglePartition
    // exchange feeding a Window over all rows
    assert(!p.contains("Window [" ) ||
      !p.split("Window").exists(seg =>
        seg.startsWith(" [") && seg.contains("windowspecdefinition()")),
      "no unpartitioned corpus window")
  }

  test("d18 source overlap: signatures partial-aggregate map-side " +
    "before the exchange") {
    val p = plan("d18_source_overlap")
    assert(p.contains("partial_min") || p.contains("partial_sum"),
      "per-source register mins must map-side combine:\n" + p)
  }

  test("d20 paragraph dedup: no window, winner via partial min(struct)") {
    val p = plan("d20_paragraph_dedup")
    assert(!p.contains("Window"),
      "first-wins must be an aggregation, not a window:\n" + p)
    assert(p.contains("partial_min"),
      "winner struct must map-side combine:\n" + p)
  }

  test("t32 ccnet buckets: offsets broadcast, no per-language corpus " +
    "window (only the within-bucket sort)") {
    val p = plan("t32_ccnet_buckets")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"),
      "bin offsets must reach rows by broadcast:\n" + p)
    // every Window must partition by (lang, _b) — a per-lang ntile
    // would show a windowspecdefinition over lang alone
    assert(!p.contains("ntile"), "no engine ntile over a language:\n" + p)
  }

  test("e23 stream admit: broadcast joins only — no hash exchange of " +
    "the document stream") {
    val p = plan("e23_stream_admit")
    val finalPlan = p.split("== Initial Plan ==")(0)
    // the probe side must reach the bit set via broadcast; the only
    // permitted non-broadcast exchanges belong to the synthetic-batch
    // construction (donor join), not the admission chain — admission
    // itself adds three BroadcastHashJoins
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).size >= 3,
      "three per-hash broadcast joins expected:\n" + finalPlan)
  }

  test("e24 stream dsir: scoring is broadcast-only — no hash exchange " +
    "or aggregation of the arrival stream") {
    val p = plan("e24_stream_dsir")
    val finalPlan = p.split("== Initial Plan ==")(0)
    // everything after the ratio-table fit must reach arrivals via
    // broadcast: the scoring chain is BroadcastNestedLoopJoin (1-row
    // map) + projection — the arrival rows themselves must never be
    // hash-exchanged (the readStream-compatibility argument). The
    // documents scan feeds both the fit and the arrivals, so the only
    // permitted doc_id/event exchanges belong to the fit's bucket
    // aggregations, never keyed by event_id.
    assert(!finalPlan.contains("hashpartitioning(event_id"),
      "arrival stream must not be hash-exchanged:\n" + finalPlan)
    assert(finalPlan.contains("BroadcastNestedLoopJoin") ||
      finalPlan.contains("BroadcastExchange"), finalPlan)
  }

  test("d23 triangles: no window anywhere; wedge and closing joins " +
    "reuse the checkpointed oriented edges") {
    val p = plan("d23_triangles")
    val finalPlan = p.split("== Initial Plan ==")(0)
    assert(!finalPlan.contains("Window"),
      "triangle counting must not sort-window:\n" + finalPlan)
  }

  test("q33 nearest as-of: ONE key exchange feeding two sorted window " +
    "passes") {
    val p = plan("q33_asof_nearest")
    val finalPlan = p.split("== Initial Plan ==")(0)
    // two Window operators (backward + forward walks)...
    assert("Window".r.findAllIn(finalPlan).size >= 2, finalPlan)
    // ...but no more hashpartitioning exchanges than the single
    // union'd key shuffle (AQE may echo it once per read)
    val hashEx = "Exchange hashpartitioning\\(user_id"
      .r.findAllIn(finalPlan).size
    assert(hashEx <= 1,
      s"the two walks must share one key exchange, saw $hashEx:\n" +
        finalPlan)
  }
}
