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

  /** Sliding token-window chunking: cut each document's token stream
    * into fixed-`size` windows starting every `stride` tokens (overlap =
    * size - stride), the "context windows with overlap" example shaper
    * of a pretraining pipeline — packSequences' complement for docs
    * LONGER than the context budget.
    *
    * Policy (mirrored exactly by the SQL oracle): tokens are the
    * whitespace-split non-empty words; a window starts at every multiple
    * of `stride` below the token count, so every token lands in at least
    * one window and the tail window may run short (no, it is NOT
    * re-anchored to n-size — re-anchoring double-counts the tail at
    * unpredictable overlap, which skews token-budget accounting).
    * Zero-token documents emit nothing.
    *
    * Scale shape: pure per-row expression work — tokenize once, explode
    * the start offsets, slice. No shuffle, no state; the plan is a
    * single projection over the scan, so it parallelizes per input split
    * at any corpus size. Output volume is input * (1 + overlap/stride),
    * the caller's knob.
    */
  def chunkOverlap(df: DataFrame, textCol: String, size: Int,
                   stride: Int): DataFrame = {
    require(stride > 0 && size >= stride,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = filter(split(trim(col(textCol)), "\\s+"),
      t => length(t) > 0)
    df.withColumn("_toks", toks)
      .withColumn("_n", size_(col("_toks")))
      .where(col("_n") > 0)
      .select((df.columns.map(col) :+ col("_toks") :+ col("_n")) :+
        posexplode(sequence(lit(0), col("_n") - 1, lit(stride)))
          .as(Seq("chunk_id", "_start")): _*)
      .withColumn("chunk_tokens",
        least(lit(size), col("_n") - col("_start")).cast("long"))
      .withColumn("chunk_text",
        array_join(slice(col("_toks"), col("_start") + 1, lit(size)), " "))
      .drop("_toks", "_n", "_start")
  }

  // size() the function, disambiguated from the Int parameters above
  /** Chat-template rendering for SFT corpora: conversations of (conv,
    * turn_idx, role, content) rows become the training string
    * `<|role|>content<|end|>` per turn, concatenated in turn order —
    * with EXACT 1-based character spans for each turn's content and a
    * `masked` flag (loss masks cover everything but assistant content;
    * the spans are what the tokenizer-side masker consumes). The span
    * arithmetic is a PREFIX SUM, not a sequential fold: each turn's
    * segment length is known row-locally, so one window cumsum over the
    * conv-keyed exchange yields every offset, and the per-conv rendered
    * text (emitted as an md5 fingerprint next to each turn row) reuses
    * the SAME exchange for its ordered aggregation — one shuffle total,
    * conversations parallelize across the cluster.
    */
  def renderChatTurns(turns: DataFrame, convCol: String,
                      idxCol: String, roleCol: String,
                      contentCol: String): DataFrame = {
    val segLen = length(col(roleCol)) + 4 + length(col(contentCol)) + 7
    val w = Window.partitionBy(col(convCol)).orderBy(col(idxCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = coalesce(sum(segLen).over(w), lit(0L))
    val start = prefix + length(col(roleCol)) + 4 + 1
    val withSpans = turns.select(col(convCol), col(idxCol),
      col(roleCol), col(contentCol),
      start.cast("long").as("content_start"),
      (start + length(col(contentCol)) - 1).cast("long")
        .as("content_end"),
      (col(roleCol) =!= "assistant").as("masked"))
    val rendered = turns
      .groupBy(col(convCol))
      .agg(md5(aggregate(
        array_sort(collect_list(struct(col(idxCol).as("i"),
          concat(lit("<|"), col(roleCol), lit("|>"), col(contentCol),
            lit("<|end|>")).as("seg")))),
        lit(""), (acc, e) => concat(acc, e.getField("seg"))))
        .as("text_fp"))
    withSpans.join(rendered, convCol)
  }

  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

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
