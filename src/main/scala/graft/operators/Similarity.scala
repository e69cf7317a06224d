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
    val joined = corpus.crossJoin(broadcast(queries))
      .withColumn("cosine",
        round(vectors.cosine(col(qVec), col(cVec)), 5))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId))
    joined
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
    val joined = cb.join(broadcast(qb), Seq("_bucket"))
      .withColumn("cosine", round(vectors.cosine(col(qVec), col(cVec)), 5))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("cosine").desc, col(cId))
    joined
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(qId), col(cId), col("cosine"), col("rank"))
  }
}
