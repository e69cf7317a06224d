package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.text

/** Corpus-trained n-gram language-model scoring (t11's unigram lives
  * inline in the gate; this is the shared bigram form t17 and the
  * `graft.Corpus -min_bigram_logp` stage both call).
  */
object LanguageModel {

  /** Per-doc mean ln P(w_i | w_{i-1}) under the corpus's own MLE bigram
    * model. Bigrams build per-row (zip_with over the words array — no
    * self-join); counts are two groupBys over the bigram/predecessor
    * tables; each doc folds its logprobs in POSITION order so the double
    * sum is reproducible. Docs with < 2 words are absent (no bigram to
    * score). Output: (idCol, n_bigrams, avg_logp).
    */
  def bigramScores(df: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    val ws = df
      .select(col(idCol), text.words(col(textCol)).as("l"))
      .where(size(col("l")) >= 2)
    val bi = ws.select(col(idCol),
      posexplode(zip_with(
        slice(col("l"), lit(1), size(col("l")) - 1),
        slice(col("l"), lit(2), size(col("l")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
        .as(Seq("pos", "bg")))
      .select(col(idCol), col("pos"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c2 = bi.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bi.join(c2, Seq("w1", "w2")).join(c1, Seq("w1"))
      .select(col(idCol), col("pos"),
        log(col("c2") / col("c1")).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(aggregate(
          array_sort(collect_list(struct(col("pos"), col("lp")))),
          lit(0.0), (acc, e) => acc + e.getField("lp"))
          / count(lit(1)), 4).as("avg_logp"))
  }

  /** Stupid-backoff trigram LM scoring (Brants et al. 2007 — the
    * smoothing DESIGNED for distributed count tables: no discount
    * normalization pass, every level is a plain count ratio):
    *   S(w₃|w₁w₂) = c₁₂₃/c₁₂ if seen,
    *                else α·c₂₃/c₂ if the bigram is seen,
    *                else α²·(c₃+1)/(N+V) (add-one base so unseen words
    *                score finitely).
    * Trained on `train`, scored over `docs` — score a held-out split
    * (unlike [[bigramScores]]' self-trained MLE) so the backoff chain
    * actually exercises; per-doc mean ln S over trigram positions plus
    * the backed-off position count (a strong OOD signal by itself).
    *
    * Plan: count tables are three groupBys of the training explode;
    * the score stream LEFT-joins them on their gram keys — five
    * key-hashed joins, no broadcast of corpus-scale tables, partial
    * aggregation everywhere; the two scalars (N, V) reduce to ONE row
    * and broadcast. Per-doc sums fold in position order (the t17
    * contract) so doubles reproduce cross-engine.
    */
  def stupidBackoffScores(train: DataFrame, docs: DataFrame,
                          idCol: String, textCol: String,
                          alpha: Double = 0.4): DataFrame = {
    def ws(df: DataFrame) = df
      .select(col(idCol), text.words(col(textCol)).as("l"))
    def tri(df: DataFrame) = ws(df)
      .where(size(col("l")) >= 3)
      .select(col(idCol), posexplode(transform(
        sequence(lit(0), size(col("l")) - 3),
        i => struct(element_at(col("l"), i + 1).as("w1"),
          element_at(col("l"), i + 2).as("w2"),
          element_at(col("l"), i + 3).as("w3")))).as(Seq("pos", "g")))
      .select(col(idCol), col("pos"), col("g.w1"), col("g.w2"),
        col("g.w3"))
    def bi(df: DataFrame) = ws(df)
      .where(size(col("l")) >= 2)
      .select(explode(zip_with(
        slice(col("l"), lit(1), size(col("l")) - 1),
        slice(col("l"), lit(2), size(col("l")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("g"))
      .select(col("g.w1"), col("g.w2"))
    val t3 = tri(train).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c123"))
    val t2 = bi(train).groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = ws(train).select(explode(col("l")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val scal = uni.agg(sum(col("c1")).as("_n"), count(lit(1)).as("_v"))
    val a = lit(alpha)
    val lp = log(
      when(col("c123").isNotNull, col("c123") / col("c12"))
        .when(col("c23").isNotNull, a * col("c23") / col("c2"))
        .otherwise(a * a * (coalesce(col("c3"), lit(0L)) + 1)
          / (col("_n") + col("_v"))))
    tri(docs)
      .join(t3, Seq("w1", "w2", "w3"), "left")
      .join(t2, Seq("w1", "w2"), "left")
      .join(t2.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c12").as("c23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("c2")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("c3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(scal))
      .select(col(idCol), col("pos"), lp.as("lp"),
        col("c123").isNull.as("_bo"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("_bo"), 1L).otherwise(0L)).as("n_backoff"),
        round(aggregate(
          array_sort(collect_list(struct(col("pos"), col("lp")))),
          lit(0.0), (acc, e) => acc + e.getField("lp"))
          / count(lit(1)), 4).as("avg_logp"))
  }

  /** CCNet-style per-language perplexity buckets: rank docs within each
    * language by LM score (best first) and cut into `k` ntile groups —
    * head/middle/tail for k = 3, the split CCNet trains/filters on.
    *
    * ntile over a per-language window would funnel EVERY doc of a
    * language through one reducer (a language can be most of a 100 TB
    * corpus), so the rank is computed exactly in two phases instead,
    * the [[Sampling.shuffleRank]] shape generalized to a value-ordered
    * key: rows bucket by (lang, floor(score·100)) — a score PREFIX, so
    * bucket-desc order == score-desc order and same-score ties can
    * never straddle a bucket; per-bucket counts (metadata-scale: langs
    * × ~few-thousand distinct rounded bins) fold into base offsets with
    * one tiny window; global rank = offset + within-bucket row_number.
    * The corpus crosses ONE hash exchange and sorts within buckets
    * only. The tile is then pure arithmetic — for 1-based rank r of n:
    * ntile(k) ≡ floor((r−1)·k/n) + 1 — so the output is bit-equal to
    * the single-window form the oracle runs.
    */
  def perplexityBuckets(scored: DataFrame, idCol: String,
                        langCol: String, scoreCol: String,
                        k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = scored
      .withColumn("_b", floor(col(scoreCol) * 100).cast("long"))
    val counts = keyed.groupBy(col(langCol), col("_b"))
      .agg(count(lit(1)).as("_c"))
    val wDesc = Window.partitionBy(col(langCol)).orderBy(col("_b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_off", coalesce(sum(col("_c")).over(wDesc), lit(0L)))
      .withColumn("_n",
        sum(col("_c")).over(Window.partitionBy(col(langCol))))
      .drop("_c")
    val labels = Seq("head", "middle", "tail")
    val tile = (((col("_rank") - 1) * k / col("_n")).cast("long") + 1)
      .cast("int")
    keyed
      .join(broadcast(offsets), Seq(langCol, "_b"))
      .withColumn("_rank",
        col("_off") + row_number().over(
          Window.partitionBy(col(langCol), col("_b"))
            .orderBy(col(scoreCol).desc, col(idCol))))
      .withColumn("tile", tile)
      .withColumn("bucket",
        if (k == 3)
          element_at(typedLit(labels), col("tile"))
        else col("tile").cast("string"))
      .drop("_b", "_off", "_n", "_rank")
  }
}
