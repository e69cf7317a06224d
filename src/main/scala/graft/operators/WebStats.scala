package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-level corpus policy — the domain-granular filter stage between
  * crawl ingest and per-document scoring (C4's and RefinedWeb's block
  * lists act on HOSTS, not pages: a spam domain's pages are individually
  * plausible; the aggregate gives it away).
  *
  * Scale design: signals reduce per-host with partial aggregation (one
  * exchange over host cardinality — millions of hosts from billions of
  * pages, always orders of magnitude smaller than the corpus), the
  * policy is a literal predicate on the aggregate row, and [[apply]]
  * re-joins the verdict BROADCAST — the corpus-side scan never
  * shuffles. Reference scope: ProGenNo/ProHap has no crawl stage; this
  * extends the w1-w4 WARC family the training-data pipeline needs.
  */
object WebStats {

  /** Extract the lowercase registrable host from a URL column with one
    * codegen'd regexp (no UDF); bare hosts pass through unchanged.
    */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^(?:[a-z][a-z0-9+.-]*://)?([^/:?#]+)", 1))

  /** Per-host quality signals: document count, mean length, share of
    * docs in `langKeep`, distinct sources — plus the keep verdict:
    * hosts need >= minDocs observations, mean length >= minMeanChars,
    * and language share >= minLangShare. Output: host, n_docs,
    * mean_chars, lang_share, n_sources, keep.
    */
  def hostPolicy(docs: DataFrame, hostCol: String, langCol: String,
                 nCharsCol: String, sourceCol: String,
                 langKeep: String = "en", minDocs: Long = 3L,
                 minMeanChars: Double = 100.0,
                 minLangShare: Double = 0.5): DataFrame =
    docs.groupBy(col(hostCol).as("host"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col(nCharsCol)), 4).as("mean_chars"),
        round(avg(when(col(langCol) === langKeep, 1.0).otherwise(0.0)), 4)
          .as("lang_share"),
        countDistinct(col(sourceCol)).as("n_sources"))
      .withColumn("keep",
        col("n_docs") >= minDocs &&
          col("mean_chars") >= minMeanChars &&
          col("lang_share") >= minLangShare)

  /** Apply a host verdict table to the corpus: broadcast semi-join on
    * the kept hosts — the corpus scan stays shuffle-free.
    */
  def applyPolicy(docs: DataFrame, policy: DataFrame,
                  hostCol: String): DataFrame =
    docs.join(broadcast(policy.where(col("keep"))
        .select(col("host").as(hostCol))),
      Seq(hostCol), "left_semi")
}
