package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** Similarity search over embedding columns.
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the corpus — one scan, no shuffle of the corpus, the
  * only shuffle is the final per-query top-k (tiny). The LSH-bucketed
  * variant is the 100 TB path: corpus and queries key by sign-bit buckets so
  * each query only scans its bucket (+ optional multi-probe), trading recall
  * for a ~2^bits scan reduction.
  */
object Similarity {

  /** Exact top-k nearest neighbors by cosine. Queries should be small
    * (broadcast); corpus is scanned once. Ties break on corpus id.
    */
  def knnCosine(queries: DataFrame, corpus: DataFrame, k: Int,
                qId: String = "qid", qVec: String = "qvec",
                cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    // Score map-side (broadcast queries, one corpus scan), then drop the
    // vectors so only narrow (qid, cid, cosine) rows ever shuffle. The
    // native graft_cosine keeps the per-pair dot product inside codegen.
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine", col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5)
          .as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Per-query top-k via the native bounded_top_k aggregate
    * (graft.plans.BoundedTopK): a fixed-size heap participating in
    * PARTIAL aggregation, so each map task ships at most k rows per query
    * into the shuffle — the scored corpus never converges on a reducer,
    * unlike a window row_number cut. Ordering: cosine desc, id asc.
    */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int,
                                      qId: String, cId: String): DataFrame = {
    graft.plans.BoundedTopK.register(scored.sparkSession)
    scored
      .groupBy(col(qId))
      .agg(expr(s"${graft.plans.BoundedTopK.name}" +
        s"(struct(cosine, $cId), $k)").as("_tk"))
      .select(col(qId), posexplode(col("_tk")).as(Seq("_r", "_e")))
      .select(col(qId), col("_e.id").as(cId),
        col("_e.score").as("cosine"),
        (col("_r") + 1).cast("long").as("rank"))
  }

  /** Approximate top-k: candidates restricted to the query's sign-bit LSH
    * bucket. Bucket on the first `bits` dimensions' signs; recall can be
    * raised by lowering `bits` (bigger buckets) or probing neighbor buckets.
    */
  def knnCosineLsh(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
                   qId: String = "qid", qVec: String = "qvec",
                   cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val qb = queries.withColumn("_bucket", vectors.signBucket(col(qVec), bits))
    val cb = corpus.withColumn("_bucket", vectors.signBucket(col(cVec), bits))
    val scored = cb.join(broadcast(qb), Seq("_bucket"))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine", col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5)
          .as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }
}
