package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.text

/** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
  * 2023): the hashed-n-gram data-selection stage modern pretraining
  * pipelines run next to a learned classifier ([[Classifier]]). Fit two
  * bag-of-hashed-n-grams unigram models — one on a small TARGET corpus
  * (the distribution you want more of), one on the RAW pool — and score
  * every raw document with its importance log-weight
  *
  *   log w(x) = Σ_f [ log p_target(bucket(f)) − log p_raw(bucket(f)) ]
  *
  * over the document's feature stream (word unigrams then word bigrams,
  * position-ordered). Documents scoring > 0 look more target-like than
  * pool-like; resampling keeps high-weight docs (the gate keeps the
  * > 0 slice; production feeds the weights to a Gumbel top-k or the
  * [[graft.operators.Sampling]] draws).
  *
  * Scale design: both count passes are ONE hash aggregation each whose
  * map-side partials collapse to ≤ `dim` rows per task; the smoothed
  * log-ratio table is ≤ `dim` rows — kilobytes at dim 2^16 — and
  * collapses to a single map row (collect_list → map_from_entries, the
  * [[Classifier]] pattern, no driver collect) that rides a broadcast
  * cross join to every scan task. Scoring is then a per-row
  * position-ordered fold — pure codegen'd expression work, zero
  * exchanges on the raw corpus scan, so the 100 TB pool is read once
  * for counts and once for scoring, never shuffled.
  *
  * Portability: bucket(f) = first 7 hex chars of md5(f) mod dim (the
  * t15 contract); probabilities are add-one-smoothed integer ratios
  * divided in doubles, ln'd, and folded in feature-position order, so
  * the DuckDB oracle reproduces every double bit-for-bit.
  */
object Dsir {

  /** Position-ordered hashed-feature stream of one document: word
    * unigrams (positions 1..n) then word bigrams (n+1..2n−1).
    */
  def features(textCol: Column): Column = {
    val ws = text.words(textCol)
    val bigrams = when(size(ws) >= 2,
      transform(sequence(lit(1), size(ws) - 1),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
      .otherwise(array().cast("array<string>"))
    concat(ws, bigrams)
  }

  /** Importance log-weights for every `raw` document against a `target`
    * sample. Output: (idCol, n_feats, dsir_logw rounded to 4 dp,
    * keep = dsir_logw > 0). Feature-less documents score 0 and are not
    * kept. `dim` is the hashed-feature space (the paper uses 10^4; any
    * value whose (bucket, log-ratio) table broadcasts is fine).
    */
  def importanceScores(target: DataFrame, raw: DataFrame, idCol: String,
                       textCol: String, dim: Int): DataFrame = {
    require(dim > 0, "dsir dim must be > 0")
    def bucketCounts(df: DataFrame, cnt: String) = df
      .select(explode(features(col(textCol))).as("_f"))
      .groupBy(Classifier.bucket(col("_f"), dim).as("bucket"))
      .agg(count(lit(1)).as(cnt))
    val ct = bucketCounts(target, "_ct")
    val cr = bucketCounts(raw, "_cr")
    val totals = ct.agg(sum(col("_ct")).as("_nt"))
      .crossJoin(cr.agg(sum(col("_cr")).as("_nr")))
    val spark = raw.sparkSession
    val lrMap = spark.range(dim).select(col("id").as("bucket"))
      .join(ct, Seq("bucket"), "left")
      .join(cr, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("_ct"), lit(0L)) + 1) /
          (col("_nt") + lit(dim)).cast("double")) -
          log((coalesce(col("_cr"), lit(0L)) + 1) /
            (col("_nr") + lit(dim)).cast("double"))).as("_lr"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("_lr")))).as("_lrm"))
    val fs = features(col(textCol))
    val logw = round(aggregate(fs, lit(0.0),
      (acc, f) => acc + element_at(col("_lrm"),
        Classifier.bucket(f, dim))), 4)
    raw.crossJoin(broadcast(lrMap))
      .select(col(idCol), size(fs).cast("long").as("n_feats"),
        logw.as("dsir_logw"), (logw > 0).as("keep"))
  }
}
