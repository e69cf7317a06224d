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
}
