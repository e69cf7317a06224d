package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING as iterative DataFrame aggregations — the
  * missing producer for t16's greedy longest-match consumer: train the
  * merge table here, feed the resulting vocab to
  * `text.vocabTokenCount` / `graft.Corpus -vocab`.
  *
  * Scale design: training runs over the WORD-TYPE table (distinct word,
  * count), not the token stream — the classic BPE trick that makes each
  * round O(vocab) instead of O(corpus). A round is one narrow per-word
  * pair explode + one (s1, s2) aggregation; the argmax merge is a 1-row
  * frame broadcast back into a per-word `replace`, so nothing but the
  * word-type table ever shuffles and the driver never holds data. Rounds
  * are sequential by nature (merge r+1 depends on r's rewrite);
  * localCheckpoint pins each round's state so lineage doesn't re-execute
  * earlier rounds.
  *
  * Merge application contract (shared verbatim with the SQL oracle):
  * symbols live in a single-space-joined string with leading/trailing
  * spaces, and a merge applies `replace(sym, " a b ", " ab ")` TWICE —
  * one pass misses occurrences whose leading space was consumed by the
  * preceding replacement (" a b a b "), and since blocked occurrences
  * are never adjacent, the second pass reaches the fixpoint (verified
  * exhaustively over small alphabets). On odd runs of a self-pair this
  * fixpoint can differ from canonical eager left-to-right BPE
  * (" a a a a a " -> [aa, a, aa] vs [aa, aa, a]) — a documented,
  * deterministic divergence both engines share.
  */
object Tokenizer {

  /** Learn `merges` BPE merges from the corpus text. Output: one row per
    * merge in training order — (rank, s1, s2, merged, pair_count) — with
    * ties broken by (pair_count DESC, s1, s2). May return fewer than
    * `merges` rows if the corpus saturates (no adjacent pair left).
    */
  def bpeTrain(df: DataFrame, textCol: String, merges: Int = 6): DataFrame = {
    require(merges >= 1, s"merges must be >= 1, got $merges")
    val wc = df
      .select(explode(graft.functions.text.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    var state = wc.select(col("w"), col("cnt"),
      concat(lit(" "),
        concat_ws(" ", array_remove(split(col("w"), ""), "")),
        lit(" ")).as("sym"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (r <- 1 to merges) {
      val toks = split(trim(col("sym")), " ")
      val pairs = state.select(col("cnt"),
        explode(zip_with(
          slice(toks, lit(1), size(toks) - 1),
          slice(toks, lit(2), size(toks) - 1),
          (a, b) => struct(a.as("s1"), b.as("s2")))).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum(col("cnt")).as("pair_count"))
      val best = pairs
        .orderBy(col("pair_count").desc, col("s1"), col("s2"))
        .limit(1).localCheckpoint()
      out += best.select(lit(r).as("rank"), col("s1"), col("s2"),
        concat(col("s1"), col("s2")).as("merged"), col("pair_count"))
      val needle = concat(lit(" "), col("_a"), lit(" "), col("_b"),
        lit(" "))
      val repl = concat(lit(" "), col("_a"), col("_b"), lit(" "))
      state = state
        .crossJoin(broadcast(best.select(col("s1").as("_a"),
          col("s2").as("_b"))))
        .select(col("w"), col("cnt"),
          replace(replace(col("sym"), needle, repl), needle, repl)
            .as("sym"))
        .localCheckpoint()
    }
    out.reduce(_ union _)
  }

  /** The trained vocabulary for `text.vocabTokenCount` / `-vocab`: every
    * single character seen in the corpus plus the learned merge tokens.
    */
  def bpeVocab(df: DataFrame, textCol: String, merges: Int = 6): DataFrame = {
    val chars = df
      .select(explode(graft.functions.text.words(col(textCol))).as("w"))
      .select(explode(array_remove(split(col("w"), ""), "")).as("token"))
      .distinct()
    chars.union(bpeTrain(df, textCol, merges).select(col("merged")
      .as("token"))).distinct()
  }
}
