package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an undirected pair list (e.g. the
  * duplicate graph) — ranks duplicate-cluster members by centrality, the
  * "which copy is canonical" signal when cluster membership alone is not
  * enough.
  *
  * Spark shape: one (dst-keyed) shuffle per iteration, contributions
  * partially aggregable — but the per-node Σ of contributions is a sum
  * of arbitrary doubles, so for ORACLE-EXACT results each node folds its
  * contribution list in src-sort order (collect_list + array_sort +
  * aggregate) and the rank rounds to 8 dp per iteration; the SQL oracle
  * replays the identical fold. The sorted fold costs more than a plain
  * sum — callers who do not need cross-engine bit-equality can flip
  * `exactFold = false` for the map-side-combined sum.
  *
  * Dangling nodes cannot exist here (every node comes from an edge and
  * edges are symmetrized), so the damping term is the standard
  * (1-d)/n + d * Σ contrib.
  */
object PageRank {

  def ranks(pairs: DataFrame, iters: Int = 5, damping: Double = 0.85,
            id1Col: String = "id1", id2Col: String = "id2",
            exactFold: Boolean = true): DataFrame = {
    // with zero iterations the returned frame would still READ the edge/
    // degree checkpoints freed below — and freed checkpoints cannot be
    // recomputed
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val fwd = pairs.select(col(id1Col).as("src"), col(id2Col).as("dst"))
    val edges = fwd.unionByName(
      fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    // materialized once: every iteration's action would otherwise replay
    // the degree aggregation (and its shuffle) against the edge table
    val degrees = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val n = degrees.select(count(lit(1)).as("_n"))
    var ranks = degrees.crossJoin(broadcast(n))
      .select(col("src").as("node"), col("_n"),
        round(lit(1.0) / col("_n"), 8).as("rank"))
    for (_ <- 1 to iters) {
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
      val prev = ranks
      ranks = summed
        .select(col("node"), col("_n"),
          round(lit(1.0 - damping) / col("_n") +
            lit(damping) * col("_sum"), 8).as("rank"))
        .localCheckpoint()
      Checkpoints.free(prev)
    }
    // the final ranks checkpoint backs the returned frame; the edge and
    // degree tables are no longer in its lineage
    Checkpoints.free(edges)
    Checkpoints.free(degrees)
    ranks.select(col("node"), col("rank"))
  }
}
