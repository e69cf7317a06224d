package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
    // Score map-side (broadcast queries, one corpus scan), then drop the
    // vectors so only narrow (qid, cid, cosine) rows ever shuffle.
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(vectors.cosine(col(qVec), col(cVec)), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Two-phase per-query top-k: a first window over (query, input
    * partition) spreads the rank-k cut across reducers, so the final
    * per-query window only sees <= k * numPartitions pre-filtered rows
    * instead of the whole scored corpus — no single-reducer bottleneck.
    */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int,
                                      qId: String, cId: String): DataFrame = {
    val w1 = Window.partitionBy(col(qId), col("_pid"))
      .orderBy(col("cosine").desc, col(cId))
    val partial = scored.withColumn("_pid", spark_partition_id())
      .withColumn("_r", row_number().over(w1))
      .where(col("_r") <= k)
      .drop("_pid", "_r")
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId))
    partial
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId), col("cosine"), col("rank"))
  }

  /** Approximate top-k: candidates restricted to the query's sign-bit LSH
    * bucket. Bucket on the first `bits` dimensions' signs; recall can be
    * raised by lowering `bits` (bigger buckets) or probing neighbor buckets.
    */
  def knnCosineLsh(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
                   qId: String = "qid", qVec: String = "qvec",
                   cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val qb = queries.withColumn("_bucket", vectors.signBucket(col(qVec), bits))
    val cb = corpus.withColumn("_bucket", vectors.signBucket(col(cVec), bits))
    val scored = cb.join(broadcast(qb), Seq("_bucket"))
      .select(col(qId), col(cId),
        round(vectors.cosine(col(qVec), col(cVec)), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }
}
