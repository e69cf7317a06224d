package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity training chunks
  * (the "pack short docs into 4k-token examples" step of a pretraining
  * pipeline).
  *
  * Capacity-quantized streaming packing: within a shard, docs in
  * `orderCol` order go to chunk floor(preceding_tokens / cap) — each
  * chunk holds ~cap tokens and may overrun by at most its last document
  * (docs longer than cap occupy chunks alone). This is the prefix-sum
  * formulation of greedy packing, so it is ONE window aggregation —
  * no sequential driver loop.
  *
  * Scale shape: the window partitions by `shardCol`, so no global
  * ordering exists anywhere — each shard's prefix sum is independent
  * and shards parallelize across the cluster. A single-shard call on a
  * 100 TB corpus would serialize into one task; shard first (by
  * source/domain/hash bucket), which is also what a mixing pipeline
  * wants semantically.
  */
object Packing {

  def packSequences(df: DataFrame, shardCol: String, orderCol: String,
                    tokensCol: String, cap: Long): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val preceding = sum(col(tokensCol)).over(w) - col(tokensCol)
    df.withColumn("chunk_idx", floor(preceding / cap))
  }

  /** Per-chunk rollup: member count, token sum, member list. */
  def chunkSummary(packed: DataFrame, shardCol: String, orderCol: String,
                   tokensCol: String): DataFrame =
    packed.groupBy(col(shardCol), col("chunk_idx"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("chunk_tokens"),
        array_join(transform(array_sort(collect_list(
          struct(col(orderCol).cast("long").as("o")))),
          e => e.getField("o").cast("string")), ";").as("doc_ids"))
}
