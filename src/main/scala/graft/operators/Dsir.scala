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
  * map-side partials collapse to ≤ `dim` rows per task (and are then
  * materialized — each is read twice, and an unmaterialized read would
  * re-scan and re-hash the whole corpus); the smoothed log-ratio table
  * is ≤ `dim` rows — kilobytes at dim 2^16 — and BROADCASTS to the
  * scoring join, so the pool's features hash codegen'd in the
  * projection and the only corpus-scale exchange is the doc-keyed
  * aggregation that orders each document's fold (the t11 contract; an
  * interpreted per-row `aggregate` fold avoids that exchange but ran
  * 4× slower at sf0.1 — md5 per feature outside codegen).
  *
  * Portability: bucket(f) = first 7 hex chars of md5(f) mod dim (the
  * t15 contract); probabilities are add-one-smoothed integer ratios
  * divided in doubles, ln'd, and folded in feature-position order, so
  * the DuckDB oracle reproduces every double bit-for-bit.
  */
object Dsir {

  /** Position-ordered hashed-feature stream of one document: word
    * unigrams (positions 1..n) then word bigrams (n+1..2n−1) — the
    * bigrams from the compiled graft_word_shingles kernel (an
    * interpreted transform/element_at build measured ~15 µs per bigram;
    * the kernel is two array reads and one concat). Requires
    * [[graft.plans.GraftFunctions.register]], which
    * [[importanceScores]] performs.
    */
  def features(textCol: Column): Column = {
    val ws = text.words(textCol)
    concat(ws, call_function("graft_word_shingles", ws, lit(2)))
  }

  /** Importance log-weights for every `raw` document against a `target`
    * sample. Output: (idCol, n_feats, dsir_logw rounded to 4 dp,
    * keep = dsir_logw > 0). Feature-less documents score 0 and are not
    * kept. `dim` is the hashed-feature space (the paper uses 10^4; any
    * value whose (bucket, log-ratio) table broadcasts is fine).
    */
  /** The smoothed per-bucket log-ratio table (bucket, _lr), `dim` rows:
    * ln((ct+1)/(Nt+dim)) − ln((cr+1)/(Nr+dim)) from the target and raw
    * feature-bucket counts. This is the TRAINED ARTIFACT of DSIR — fit
    * once (or refreshed as the pool grows), persisted, and broadcast to
    * every scorer; [[importanceScores]] fits and scores in one call,
    * [[scoreAgainst]] scores arrivals (batch or STREAM) against it.
    */
  def ratioTable(target: DataFrame, raw: DataFrame, textCol: String,
                 dim: Int): DataFrame = {
    require(dim > 0, "dsir dim must be > 0")
    graft.plans.GraftFunctions.register(raw.sparkSession)
    def buckets(c: Column) = call_function("graft_md5_buckets", c, lit(dim))
    def bucketCounts(df: DataFrame, cnt: String) = df
      .select(explode(buckets(features(col(textCol)))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as(cnt))
    // materialize the two <= dim-row count tables: they are each read
    // twice (log-ratio join + totals), and every unmaterialized read
    // would re-scan and re-hash the WHOLE corpus — measured 29.6 s vs
    // 6.4 s at sf0.1 for the identical plan without the checkpoint
    val ct = bucketCounts(target, "_ct").localCheckpoint()
    val cr = bucketCounts(raw, "_cr").localCheckpoint()
    val totals = ct.agg(sum(col("_ct")).as("_nt"))
      .crossJoin(cr.agg(sum(col("_cr")).as("_nr")))
    raw.sparkSession.range(dim).select(col("id").as("bucket"))
      .join(ct, Seq("bucket"), "left")
      .join(cr, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((coalesce(col("_ct"), lit(0L)) + 1) /
          (col("_nt") + lit(dim)).cast("double")) -
          log((coalesce(col("_cr"), lit(0L)) + 1) /
            (col("_nr") + lit(dim)).cast("double"))).as("_lr"))
  }

  /** Stateless scoring against a pre-fit [[ratioTable]]: the ratio rows
    * collapse to one broadcast map row (no driver collect) and the
    * log-weight is a per-row fold over the fused bucket kernel's output
    * — ZERO aggregation state, broadcast-only plan, so the identical
    * call runs unchanged on a readStream (e24: admission scoring of an
    * arriving crawl; refresh the persisted ratio table as the pool
    * grows — the stream never re-fits). The fold adds the same
    * log-ratio doubles in the same feature order as
    * [[importanceScores]]'s ordered aggregation, so the two scorers are
    * bit-equal.
    */
  def scoreAgainst(docs: DataFrame, ratios: DataFrame, idCol: String,
                   textCol: String, dim: Int): DataFrame = {
    require(dim > 0, "dsir dim must be > 0")
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val lrMap = ratios.agg(map_from_entries(collect_list(
      struct(col("bucket"), col("_lr")))).as("_m"))
    val bks = call_function("graft_md5_buckets",
      features(col(textCol)), lit(dim))
    // + 0.0 normalizes IEEE −0.0 to +0.0: the engines' ln sums differ
    // by ulps (absorbed by round-4), but a tiny-negative sum rounds to
    // −0.0 in one engine and +0.0 in the other — same value, different
    // hash text (found by the sf0.1 replay; two docs there straddle 0)
    val logw = round(aggregate(bks, lit(0.0),
      (acc, b) => acc + element_at(col("_m"), b)), 4) + lit(0.0)
    docs.crossJoin(broadcast(lrMap))
      .select(col(idCol), size(bks).cast("long").as("n_feats"),
        logw.as("dsir_logw"), (logw > 0).as("keep"))
  }

  def importanceScores(target: DataFrame, raw: DataFrame, idCol: String,
                       textCol: String, dim: Int): DataFrame = {
    require(dim > 0, "dsir dim must be > 0")
    graft.plans.GraftFunctions.register(raw.sparkSession)
    def buckets(c: org.apache.spark.sql.Column) =
      call_function("graft_md5_buckets", c, lit(dim))
    val lrs = ratioTable(target, raw, textCol, dim)
    val feats = raw
      .select(col(idCol),
        posexplode(buckets(features(col(textCol))))
          .as(Seq("_pos", "bucket")))
    val scored = feats.join(broadcast(lrs), "bucket")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("_n"),
        // + 0.0: −0.0 → +0.0 (the scoreAgainst zero-sign note)
        (round(aggregate(
          array_sort(collect_list(struct(col("_pos"), col("_lr")))),
          lit(0.0), (acc, e) => acc + e.getField("_lr")), 4) + lit(0.0))
          .as("_s"))
    raw.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("_n"), lit(0L)).as("n_feats"),
        coalesce(col("_s"), lit(0.0)).as("dsir_logw"),
        (coalesce(col("_s"), lit(0.0)) > 0).as("keep"))
  }
}
