package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword scoring over a document corpus for a fixed term set —
  * the retrieval primitive behind training-data curation passes like
  * "rank corpus passages against benchmark queries".
  *
  * Plan shape at 100 TB: one corpus scan computes per-doc term
  * frequencies as native array expressions; the corpus-level statistics
  * (N, avgdl, per-term document frequencies) reduce to a SINGLE row that
  * broadcasts back via a cross join — no shuffle of the corpus at all.
  * The final global top-k uses the native bounded_top_k partial
  * aggregate, so each map task ships at most k rows.
  *
  * Determinism contract with the SQL oracle: contributions are summed in
  * the literal term order with identical parenthesization (doubles are
  * bit-equal), scores round to 5 dp BEFORE ranking, rank ties break on
  * doc id ascending.
  */
object Bm25 {

  /** @param terms fixed query terms (lower-case); scored in given order
    * @param topK  global result cutoff (score desc, id asc)
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            terms: Seq[String], topK: Int,
            k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = df.sparkSession
    graft.plans.BoundedTopK.register(spark)
    val words = regexp_extract_all(lower(col(textCol)), lit("[a-z]+"), lit(0))
    val perDoc = df.select(
      col(idCol).as("doc_id") +: words.as("_w") +:
        size(words).as("_dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(words, w => w === t)).as(s"_tf$i")
        }: _*)
    val statCols =
      (sum(col("_dl")).cast("double") / count(lit(1))).as("_avgdl") +:
        terms.indices.map(i =>
          sum(when(col(s"_tf$i") > 0, 1).otherwise(0)).as(s"_df$i"))
    val stats = perDoc.agg(count(lit(1)).as("_n"), statCols: _*)
    val scored = perDoc.crossJoin(broadcast(stats))
    val contribs = terms.indices.map { i =>
      val tf = col(s"_tf$i").cast("double")
      val idf = log((col("_n") - col(s"_df$i") + lit(0.5)) /
        (col(s"_df$i") + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) +
          lit(b) * (col("_dl").cast("double") / col("_avgdl"))))
    }
    val total = contribs.reduce(_ + _)
    val ranked = scored
      .select(col("doc_id"), round(total, 5).as("score"))
      .where(col("score") > 0)
      .groupBy(lit(1).as("_g"))
      .agg(expr(s"${graft.plans.BoundedTopK.name}" +
        s"(struct(score, doc_id), $topK)").as("_tk"))
      .select(posexplode(col("_tk")).as(Seq("_r", "_e")))
      .select(col("_e.id").as("doc_id"), col("_e.score").as("score"),
        (col("_r") + 1).cast("long").as("rank"))
    ranked
  }
}
