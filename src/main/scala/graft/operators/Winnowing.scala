package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03
  * — the MOSS plagiarism-detection algorithm): the classic LOCAL
  * fingerprinting scheme next to minhash (d2) and simhash (d3). Each
  * document's word k-grams are hashed; every window of `window`
  * consecutive gram hashes contributes its minimum; the distinct
  * selected hashes are the document's fingerprint set. The winnowing
  * guarantee: any run of at least window + k - 1 words shared verbatim
  * between two documents yields at least one SHARED fingerprint —
  * detection of local overlap with a density bound of ~2/(window+1),
  * where minhash only sees whole-document resemblance.
  *
  * Scale: fingerprint selection is a per-row fold — ZERO shuffles
  * (the O(n * window) slice-min is the honest per-doc cost; the
  * classic streaming min-queue is a constant-factor refinement). Only
  * (fingerprint, id) pairs reach [[sharedFingerprints]]' groupBy, the
  * d7 rollup shape — never text. Hashes are 60-bit md5 prefixes
  * (15 hex digits), so an independent engine replays the selection
  * bit-for-bit (xxhash64 would not be).
  */
object Winnowing {

  private def gramHash(g: Column): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long")

  /** Per-document winnowing fingerprints: one (id, fingerprint) row per
    * distinct selected hash. Documents shorter than k words have no
    * grams and emit nothing; documents with fewer than `window` grams
    * emit the minimum over what is there (>= 1 fingerprint for any doc
    * with >= k words — the guarantee MOSS relies on).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, window: Int = 4): DataFrame = {
    require(k >= 1 && window >= 1, "winnowing: need k >= 1, window >= 1")
    val ws = text.words(col(textCol))
    val grams = when(size(ws) >= k,
      transform(sequence(lit(0), size(ws) - k),
        i => array_join(slice(ws, i + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>"))
    val n = size(col("_h"))
    df.select(col(idCol).as("id"), transform(grams, gramHash(_)).as("_h"))
      .where(size(col("_h")) > 0)
      .select(col("id"), explode(array_distinct(
        transform(sequence(lit(0), greatest(n - window, lit(0))),
          i => array_min(slice(col("_h"), i + 1, lit(window))))))
        .as("fingerprint"))
  }

  /** MOSS-style match rollup: fingerprints selected by more than one
    * document, with the ordered member list. One groupBy over (hash, id)
    * pairs — a boilerplate fingerprint shared by a million docs is one
    * group, never a pair explosion (the d7/d13 linearity argument).
    */
  def sharedFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, window: Int = 4): DataFrame =
    fingerprints(df, idCol, textCol, k, window)
      .groupBy(col("fingerprint"))
      .agg(countDistinct(col("id")).as("n_docs"),
        array_join(sort_array(collect_set(col("id").cast("string"))), ";")
          .as("doc_ids"))
      .where(col("n_docs") > 1)
}
