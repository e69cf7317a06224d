package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{hashing, text}
import graft.plans.GraftFunctions

/** Streaming ingest near-duplicate gate: each arriving document is
  * LSH-checked against a STATIC indexed corpus — the streaming face of
  * [[graft.operators.Dedup.minhashLshIncremental]] (which covers the
  * batch-ingest mode, including new-vs-new pairs; a stream cannot
  * self-join its own derived frames, so stream-vs-stream pairs are out
  * of scope here and belong to the batch compactor).
  *
  * Scale shape, per micro-batch:
  *  - the arriving docs are shingled/signed by the native graft_*
  *    kernels (stateless projections — no state, no shuffle);
  *  - the shingle array RIDES the band-key explode: unlike the batch
  *    operator (which re-joins ids to a shingle table after candidate
  *    pruning) a streaming frame cannot be re-joined to itself, and the
  *    static-index join below broadcasts, so the arrays never cross a
  *    shuffle anyway — the explode costs `bands` copies of each array
  *    in-memory only;
  *  - the corpus index — persisted state in production, maintained with
  *    `corpusBuckets.union(minhashBuckets(batch))` and re-capped at
  *    compaction — arrives ALREADY skew-capped ([[graft.operators.Dedup
  *    .capIndex]]: (id, bucket, bucket_size), over-cap buckets dropped at
  *    index-BUILD time) and is joined stream-static (broadcast when it
  *    fits); the per-micro-batch query never aggregates the index — at
  *    100 TB the index is billions of rows, and paying a groupBy over it
  *    per batch would sink a low-latency ingest gate. Only buckets an
  *    arriving doc touches produce rows;
  *  - band collisions are collapsed (dropDuplicates — all copies of a
  *    pair originate from the SAME input row's explode, so with
  *    exactly-once ingest the dedup state never matters across
  *    micro-batches) before the verify join pays the corpus text scan,
  *    which is semi-join-pruned to candidate ids by the join itself.
  *
  * Output: (new_id, dup_id, jaccard) — one row per stream-corpus pair
  * with exact shingle Jaccard >= `jaccardThreshold`. Works identically
  * on a batch DataFrame, which is what the e11 gate oracle checks;
  * StreamingSpec asserts MemoryStream == batch parity.
  */
object StreamDedup {

  /** `corpusBuckets` MUST be a [[graft.operators.Dedup.capIndex]] result
    * — (id, bucket, bucket_size), capped with the SAME `maxBucketSize`
    * passed here.
    *
    * Skew-cap semantics differ by mode, deliberately:
    *  - STREAMING (`watermark` set): corpus-side-only cap — the sizes
    *    were precomputed at index-build time, and a stream cannot
    *    window-count its own micro-batch's bucket membership (an
    *    aggregation joined back to the same stream is unsupported), so
    *    arriving members don't count toward the cap. Relative to the
    *    batch operators' COMBINED-size cap this only WIDENS recall —
    *    no pair a batch run keeps is ever dropped.
    *  - BATCH (`watermark = None` — the e11 gate and its d2-derived
    *    oracle): the batch's own per-bucket membership is folded in via
    *    an aggregation over the ARRIVING BATCH only (never the index),
    *    restoring the exact combined-size cap of
    *    [[graft.operators.Dedup.minhashLshIncremental]].
    *
    * `watermark = Some((tsCol, delay))` bounds the band-collision dedup
    * state on a real stream: duplicates of a pair all originate from ONE
    * input row's band explode (same micro-batch), so any non-zero delay
    * suffices — without it Spark's dropDuplicates keeps every seen pair
    * key forever. Batch callers (the e11 gate) leave it None.
    */
  def ingestDedup(stream: DataFrame, corpus: DataFrame,
                  corpusBuckets: DataFrame,
                  idCol: String, textCol: String,
                  shingleWords: Int = 3, bands: Int = 8, rows: Int = 2,
                  jaccardThreshold: Double = 0.5,
                  maxBucketSize: Int = 1000,
                  watermark: Option[(String, String)] = None): DataFrame = {
    GraftFunctions.register(stream.sparkSession)
    val k = bands * rows
    val marked = watermark match {
      case Some((ts, delay)) => stream.withWatermark(ts, delay)
      case None => stream
    }
    val tsCols = watermark.map(w => col(w._1)).toSeq
    val arrivals = marked.select(col(idCol).as("new_id") +: tsCols :+
        array_distinct(call_function("graft_word_shingles",
          text.words(col(textCol)), lit(shingleWords))).as("sh1"): _*)
      .where(size(col("sh1")) > 0)
      .withColumn("sig",
        call_function("graft_minhash_sig", col("sh1"), lit(k)))
      .select(col("new_id") +: tsCols :+ col("sh1") :+
        explode(hashing.bandKeys(col("sig"), bands, rows)).as("bucket"): _*)
    require(corpusBuckets.columns.contains("bucket_size"),
      "corpusBuckets must be a pre-capped Dedup.capIndex result " +
        "(id, bucket, bucket_size): the skew cap is computed at " +
        "index-build time, never per micro-batch")
    val idx = corpusBuckets.withColumnRenamed("id", "dup_id")
    val cappedIdx = watermark match {
      case Some(_) =>
        // streaming: over-cap buckets were already dropped by capIndex;
        // nothing in this plan aggregates the index (see scaladoc)
        idx.drop("bucket_size")
      case None =>
        // batch/gate: fold the arriving batch's own bucket membership
        // into the cap — combined-size semantics, oracle-aligned. The
        // groupBy runs over the batch's exploded band keys only (bucket
        // column alone — the shingle arrays stay out of this shuffle).
        val batchSizes = arrivals.select("bucket")
          .groupBy("bucket").agg(count(lit(1)).as("_nsz"))
        idx.join(batchSizes, Seq("bucket"))
          .where(col("bucket_size") + col("_nsz") <= lit(maxBucketSize.toLong))
          .select("bucket", "dup_id")
    }
    val withDup = arrivals.join(cappedIdx, Seq("bucket"))
      .select(col("new_id") +: tsCols :+ col("dup_id") :+ col("sh1"): _*)
    val cand = (watermark match {
      case Some(_) => withDup.dropDuplicatesWithinWatermark(
        "new_id", "dup_id")
      case None => withDup.dropDuplicates("new_id", "dup_id")
    }).drop(watermark.map(_._1).toSeq: _*)
    val cdocs = corpus.select(col(idCol).as("dup_id"),
        array_distinct(call_function("graft_word_shingles",
          text.words(col(textCol)), lit(shingleWords))).as("sh2"))
      .where(size(col("sh2")) > 0)
    cand.join(cdocs, Seq("dup_id"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))), 5))
      .where(col("jaccard") >= jaccardThreshold)
      .select("new_id", "dup_id", "jaccard")
  }
}
