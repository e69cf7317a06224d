package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{hashing, text}

/** Document deduplication for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard and embedding-cosine near-dup.
  *
  * Scale notes: every variant avoids the O(n^2) cross product — exact dedup
  * is one hash groupBy; MinHash/SimHash/embedding near-dup generate
  * candidates through bucket self-joins whose bucket sizes stay bounded, so
  * the shuffled pair count stays ~linear in corpus size.
  */
object Dedup {

  /** Exact dedup: cluster by content hash of the raw text.
    * Output: one row per distinct content (hash, n_docs, canonical doc =
    * min id, ordered member list).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("canonical_id"),
        array_join(sort_array(collect_list(col(idCol).cast("string"))), ";")
          .as("doc_ids"))

  /** MinHash + LSH banding near-duplicate candidate pairs, verified with the
    * exact Jaccard over the shingle sets.
    *
    * shingle -> minhash (k = bands*rows) -> band buckets -> bucket self-join
    * -> distinct candidate pairs -> Jaccard >= threshold.
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleWords: Int = 3, bands: Int = 8, rows: Int = 2,
                 jaccardThreshold: Double = 0.5): DataFrame = {
    val k = bands * rows
    val docs = df.select(
      col(idCol).as("id"),
      array_distinct(text.wordShingles(col(textCol), shingleWords))
        .as("shingles"))
      .where(size(col("shingles")) > 0)

    val sigs = docs.withColumn("sig", hashing.minhash(col("shingles"), k))
    val buckets = sigs.select(col("id"), col("shingles"),
      explode(hashing.bandKeys(col("sig"), bands, rows)).as("bucket"))

    val l = buckets.select(col("bucket"), col("id").as("id1"),
      col("shingles").as("sh1"))
    val r = buckets.select(col("bucket"), col("id").as("id2"),
      col("shingles").as("sh2"))

    l.join(r, Seq("bucket"))
      .where(col("id1") < col("id2"))
      .select("id1", "id2", "sh1", "sh2").distinct()
      .withColumn("jaccard", round(
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))), 5))
      .where(col("jaccard") >= jaccardThreshold)
      .select("id1", "id2", "jaccard")
  }

  /** SimHash near-dup: documents whose `bits`-wide simhash prefixes collide
    * are candidates; pairs within `maxHamming` are reported.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String,
              bits: Int = 32, prefixBits: Int = 12,
              maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      hashing.simhash(text.bpeTokens(col(textCol)), bits).as("sh"))
      .where(length(col("sh")) === bits)
    val l = docs.select(col("id").as("id1"), col("sh").as("sh1"),
      col("sh").substr(1, prefixBits).as("pfx"))
    val r = docs.select(col("id").as("id2"), col("sh").as("sh2"),
      col("sh").substr(1, prefixBits).as("pfx"))
    l.join(r, Seq("pfx"))
      .where(col("id1") < col("id2"))
      .withColumn("hamming", hashing.hammingDist(col("sh1"), col("sh2")))
      .where(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** Character n-gram Jaccard similarity join with hash-prefix blocking.
    * Blocking key = first hex char of the fingerprint bucket `blockMod`,
    * keeping candidate pairs ~n^2/blockMod while remaining deterministic.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 4, blockMod: Int = 16,
                   threshold: Double = 0.2): DataFrame = {
    val docs = df.select(
      col(idCol).as("id"),
      (col(idCol) % blockMod).as("block"),
      text.charNgrams(col(textCol), n).as("grams"))
      .where(size(col("grams")) > 0)
    val l = docs.select(col("block"), col("id").as("id1"),
      col("grams").as("g1"))
    val r = docs.select(col("block"), col("id").as("id2"),
      col("grams").as("g2"))
    l.join(r, Seq("block"))
      .where(col("id1") < col("id2"))
      .withColumn("jaccard", round(
        size(array_intersect(col("g1"), col("g2"))).cast("double") /
          size(array_union(col("g1"), col("g2"))), 5))
      .where(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Embedding-cosine near-duplicate pairs, blocked by a grouping column
    * (e.g. a cluster label or LSH sign bucket).
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       blockCol: String, threshold: Double): DataFrame = {
    import graft.functions.vectors
    val l = df.select(col(blockCol).as("block"), col(idCol).as("id1"),
      col(vecCol).as("v1"))
    val r = df.select(col(blockCol).as("block"), col(idCol).as("id2"),
      col(vecCol).as("v2"))
    l.join(r, Seq("block"))
      .where(col("id1") < col("id2"))
      .withColumn("cosine", round(vectors.cosine(col("v1"), col("v2")), 5))
      .where(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
  }
}
