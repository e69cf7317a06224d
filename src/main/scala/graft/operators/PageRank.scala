package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected pair list (e.g. the
  * duplicate graph) — ranks duplicate-cluster members by centrality, the
  * "which copy is canonical" signal when cluster membership alone is not
  * enough.
  *
  * Spark shape: one (dst-keyed) shuffle per iteration, contributions
  * partially aggregable. The default (`exactFold = false`) is a plain
  * `sum`, which Spark map-side combines — a hub node with millions of
  * in-edges costs one double per map partition at the reducer, O(parts)
  * memory. `exactFold = true` instead folds each node's contribution
  * list in src-sort order (collect_list + array_sort + aggregate) so the
  * double summation order is reproducible across engines — the SQL
  * oracle replays the identical fold — at the cost of materializing ALL
  * of a node's contributions as one array on one task: O(degree) memory
  * on the hub's reducer. Reserve `exactFold = true` for cross-engine
  * bit-equality checks at test scale; production graphs keep the
  * default. Ranks round to 8 dp per iteration either way.
  *
  * Dangling nodes cannot exist here (every node comes from an edge and
  * edges are symmetrized), so the damping term is the standard
  * (1-d)/n + d * Σ contrib.
  */
object PageRank {

  def ranks(pairs: DataFrame, iters: Int = 5, damping: Double = 0.85,
            id1Col: String = "id1", id2Col: String = "id2",
            exactFold: Boolean = false): DataFrame = {
    // with zero iterations the returned frame would still READ the edge/
    // degree checkpoints freed below — and freed checkpoints cannot be
    // recomputed
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val fwd = pairs.select(col(id1Col).as("src"), col(id2Col).as("dst"))
    // NOTE (r18, attempted and reverted): pre-partitioning the edge
    // table by a regime-chosen key (the labelPropagation/CC treatment
    // below) MEASURED SLOWER here — PageRank's sum contributions
    // partial-aggregate map-side, so the per-iteration exchanges are
    // already node-cardinality-tiny (2.6 MB total at d11), and both the
    // explicit per-iteration broadcasts (+10 builds) and the
    // co-partitioned sort-merge variant (+10 stages) cost more fixed
    // per-job latency than the bytes they saved. Guide §1.1 discipline:
    // the checkpointed r17 shape stays.
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(Checkpoints.pin)
    // materialized once: every iteration's action would otherwise replay
    // the degree aggregation (and its shuffle) against the edge table
    val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .transform(Checkpoints.pin)
    val n = degrees.select(count(lit(1)).as("_n"))
    var ranks = degrees.crossJoin(broadcast(n))
      .select(col("src").as("node"), col("_n"),
        round(lit(1.0) / col("_n"), 8).as("rank"))
    // checkpoint cadence: materializing every iteration costs one full
    // job per round; every 4th keeps the un-executed plan shallow (a
    // 4-round chain of join+agg) while cutting the materializations —
    // the LAST iteration always checkpoints so the returned frame reads
    // one flat table and the edge/degree frees below stay safe
    var prevCk: Option[DataFrame] = None
    for (i <- 1 to iters) {
      ranks = iterate(edges, degrees, ranks, damping, exactFold)
      if (i % 4 == 0 || i == iters) {
        ranks = Checkpoints.pin(ranks)
        prevCk.foreach(Checkpoints.free)
        prevCk = Some(ranks)
      }
    }
    // the final ranks checkpoint backs the returned frame; the edge and
    // degree tables are no longer in its lineage
    Checkpoints.free(edges)
    Checkpoints.free(degrees)
    ranks.select(col("node"), col("rank"))
  }

  /** One power-iteration step, pre-checkpoint — package-private so
    * PlanSpec can assert the default path's partial (map-side) sum.
    */
  private[graft] def iterate(edges: DataFrame, degrees: DataFrame,
                             ranks: DataFrame, damping: Double,
                             exactFold: Boolean): DataFrame = {
    val contribs = edges
      .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .join(degrees, Seq("src"))
      .select(col("dst").as("node"), col("src"), col("_n"),
        (col("rank") / col("deg")).as("c"))
    val summed =
      if (exactFold)
        contribs.groupBy(col("node"), col("_n"))
          .agg(aggregate(
            array_sort(collect_list(struct(col("src"), col("c")))),
            lit(0.0), (acc, e) => acc + e.getField("c")).as("_sum"))
      else
        contribs.groupBy(col("node"), col("_n"))
          .agg(sum(col("c")).as("_sum"))
    summed.select(col("node"), col("_n"),
      round(lit(1.0 - damping) / col("_n") +
        lit(damping) * col("_sum"), 8).as("rank"))
  }

  /** Frontier-based BFS over a DIRECTED edge list: shortest hop distance
    * from `source` to every node reachable within `maxDepth` — the third
    * iterative-graph pattern next to d6's label propagation and d11's
    * PageRank (those converge values everywhere; BFS expands a frontier,
    * so each round's work is proportional to the frontier, not the
    * graph). Per round: frontier ⋈ edges (one key shuffle), minus
    * already-visited (anti join), localCheckpoint pins the round and
    * cuts lineage; the loop ends on an empty frontier or maxDepth. The
    * round count is the graph's (bounded) depth — the same
    * driver-side-iteration contract as connected components, with
    * frontier emptiness (a count on a checkpointed frame) deciding
    * termination, never vertex data on the driver.
    */
  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection over the duplicate/link graph, the fourth iterative-graph
    * pattern next to label-converging CC, value-converging PageRank and
    * frontier-expanding BFS. Every node starts as its own label; each
    * round every node adopts the MOST FREQUENT label among its
    * neighbors, ties to the smallest label — the deterministic
    * synchronous variant (asynchronous/randomized LP is not
    * replayable), so a fixed `rounds` unroll is exactly reproducible in
    * SQL. Edges are treated as undirected (symmetrized + distinct so a
    * duplicated edge cannot double-vote).
    *
    * Plan per round: one edge⋈labels hash join (labels are (node,
    * label) longs — narrow), one (node, label) count aggregation with
    * map-side partials, and ONE arg-min partial agg
    * (min(struct(-count, label))) — no window; rounds pin with
    * localCheckpoint (the d6/d11/d19 iteration contract). Work per
    * round is O(|E|) shuffled on node keys; labels never fan out.
    */
  def labelPropagation(edges: DataFrame, rounds: Int = 4): DataFrame = {
    require(rounds >= 1, "labelPropagation: rounds must be >= 1")
    // Pre-partition the loop-invariant edge table ONCE (guide §2.4) and
    // pin it with persist(), not a checkpoint — a checkpoint comes back
    // as UnknownPartitioning (measured on 4.1.2), a cached plan keeps
    // its outputPartitioning. The key is regime-chosen
    // (spark.graft.labelprop.partition):
    //  - "group" (src, the default): right whenever the per-round label
    //    table broadcasts (AQE picks BHJ for a node-cardinality table
    //    under the broadcast threshold — every local/bench run, and any
    //    cluster whose node table fits). The broadcast join preserves
    //    sym's partitioning, so the mode() aggregation — whose per-group
    //    count-map partials DON'T compress map-side, making its exchange
    //    the round's dominant shuffle (~60 MB/round at lpx scale) —
    //    runs exchange-free: ZERO per-round exchanges.
    //  - "join" (dst): for clusters whose label table exceeds broadcast —
    //    there the per-round join is a sort-merge on dst, and
    //    pre-partitioning by dst removes the edge re-shuffle instead
    //    (1 exchange/round, the minimum when labels must move).
    val lpKey = edges.sparkSession.conf
      .getOption("spark.graft.labelprop.partition").getOrElse("group")
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct()
      .repartition(if (lpKey == "join") col("dst") else col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .transform(Checkpoints.pin)
    // checkpoint cadence: LP has no per-round termination check (fixed
    // rounds, one downstream action), so materializing every round
    // buys nothing — every 2nd round keeps the un-executed plan
    // shallow (PageRank's cadence argument) at half the label-table
    // writes; the LAST round always checkpoints so the returned frame
    // reads one flat table
    for (i <- 1 to rounds) {
      // mode(_, deterministic = true) = most frequent neighbor label,
      // ties to the SMALLEST — exactly the min(struct(-count, label))
      // fold this replaces, in ONE src-keyed shuffle per round instead
      // of two ((src,label) count + src arg-min): the per-group
      // label→count map merges map-side, and a node's map is bounded
      // by its distinct neighbor labels.
      // In the "group" regime the label table is broadcastable by
      // definition — but only an EXPLICIT hint makes the STATIC plan a
      // broadcast join: left to AQE, the initial plan is a sort-merge
      // whose sym-side shuffle is already written by the time AQE
      // converts it (measured: the ~60 MB/round exchange this exists to
      // remove survived runtime-only conversion).
      val nl = labels.select(col("node").as("dst"),
        col("label").as("_nl"))
      labels = sym
        .join(if (lpKey == "join") nl else broadcast(nl), Seq("dst"))
        .groupBy(col("src"))
        .agg(mode(col("_nl"), true).as("label"))
        .withColumnRenamed("src", "node")
      if (i % 2 == 0 || i == rounds) labels = Checkpoints.pin(labels)
    }
    // the returned frame reads only the final labels pin
    sym.unpersist(blocking = false)
    labels
  }

  /** Exact triangle count + global clustering coefficient — the fifth
    * graph pattern next to CC / PageRank / BFS / label propagation, and
    * the classic skew-prone graph aggregate. Degree-ordered edge
    * orientation (node-iterator++): every undirected edge points from
    * its (degree, node)-smaller endpoint to the larger, wedges are
    * generated ONLY at each edge's smaller endpoint, and a wedge (v, w)
    * closes iff the oriented edge v→w exists. Orientation is what makes
    * this scale: out-degrees are bounded by O(√E) regardless of hub
    * size — a celebrity node with 10^7 followers RECEIVES orientation
    * and emits no wedges — so total wedge volume is O(E^1.5) worst case
    * instead of Σ deg² (hub-quadratic). Plan: one distinct over the
    * canonicalized edge list (checkpointed — three consumers), one
    * degree aggregation, two node-keyed joins to attach degrees, one
    * source-keyed self-join for wedges, one edge-keyed semi-style join
    * to close them; counts reduce to a single row. Clustering =
    * 3·triangles / Σ d(d−1)/2, exact integers until the one rounded
    * division.
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val aFirst = (col("da") < col("db")) ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"),
        when(aFirst, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    val xLower = (col("x.dv") < col("y.dv")) ||
      (col("x.dv") === col("y.dv") && col("x.v") < col("y.v"))
    // NOTE (r18, attempted and reverted): a Bloom prefilter over the
    // oriented edge keys (guide §3.2 — drop non-closing wedges before
    // the closing join's exchange) MEASURED 0.91x here: the bench graph
    // closes most of its wedges, so the filter dropped little while its
    // build added a count + bloom job per call. On sparse real graphs
    // (wedges >> triangles) the same prefilter is the standard win —
    // re-add behind measurement if such a corpus ever ships.
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && xLower)
      .select(col("x.v").as("wu"), col("y.v").as("wv"))
    // shuffled-hash on the oriented build side: the wedge side is the
    // big one (O(E^1.5) worst case) — hashing the O(E) side skips the
    // sort-merge sort of both (guide §3.1)
    val tri = wedges
      .join(oriented.select(col("u").as("wu"), col("v").as("wv"))
        .hint("shuffle_hash"),
        Seq("wu", "wv"))
      .agg(count(lit(1)).as("n_triangles"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) DIV 2")).as("_wtot"))
    val ne = und.agg(count(lit(1)).as("n_edges"))
    stats.crossJoin(ne).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        when(col("_wtot") > 0,
          round(lit(3.0) * col("n_triangles") / col("_wtot"), 5))
          .as("clustering"))
  }

  def bfsDepths(edges: DataFrame, source: Long,
                maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "bfsDepths: maxDepth must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"))
    var dist = Seq((source, 0L)).toDF("node", "dist").transform(Checkpoints.pin)
    var frontier = dist
    var depth = 0L
    var done = false
    while (!done && depth < maxDepth) {
      depth += 1
      val next = frontier.select(col("node").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(depth))
        .transform(Checkpoints.pin)
      if (next.isEmpty) done = true
      else {
        dist = Checkpoints.pin(dist.unionByName(next))
        frontier = next
      }
    }
    dist
  }
}
