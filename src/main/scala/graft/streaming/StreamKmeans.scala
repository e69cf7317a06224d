package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Online k-means state: k centroids and their assignment counts. */
case class KmState(cents: Seq[Seq[Double]], ns: Seq[Long])

/** Streaming k-means TRAINING — the missing half of the streaming-ANN
  * story: e15 assigns stream vectors to a FIXED codebook; this op keeps
  * the codebook itself current as vectors arrive (MacQueen's sequential
  * update: the classic online k-means). State is k·d doubles + k longs
  * FOREVER, updated incrementally per micro-batch; emission after every
  * trigger is the model so far, so a downstream e15 assignment can
  * refresh its codebook without a batch retrain.
  *
  * Determinism contract (the e17 pattern): the fold is order-dependent,
  * so rows sort by `vec_id` within each group batch and the batch form
  * equals the stream fed the same order (StreamingSpec proves slice
  * parity). Every arithmetic step — squared-L2 left-fold over dims,
  * first-index argmin, `c += (x-c)/n` — is the identical IEEE op
  * sequence the DuckDB oracle replays, so doubles match bit-for-bit.
  *
  * Scale: ONE model per group key — the single-key form is honest about
  * sequential-update semantics (a global order is a total order; nothing
  * distributed can fold it in parallel). At corpus scale train sharded
  * models per key upstream (e.g. one per language/source) — the
  * operator is already keyed — or use the batch kmeansCodebook
  * (Lloyd's) where order-independence buys parallelism.
  */
object StreamKmeans {

  /** First `k` rows (in vec_id order) seed the centroids with n=1 each;
    * every later row moves its nearest centroid by (x - c)/n.
    */
  private def fold(acc0: Option[KmState], k: Int,
                   rows: Seq[(Long, Long, Seq[Double])]): KmState = {
    var cents = acc0.map(_.cents.map(_.toArray).toArray)
      .getOrElse(Array.empty[Array[Double]])
    var ns = acc0.map(_.ns.toArray).getOrElse(Array.empty[Long])
    rows.sortBy(_._2).foreach { case (_, _, x) =>
      if (cents.length < k) {
        cents :+= x.toArray
        ns :+= 1L
      } else {
        var best = 0; var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          var d = 0.0; var i = 0
          while (i < x.length) {
            val diff = x(i) - cents(j)(i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = j } // strict < = first-index
          j = j + 1
        }
        ns(best) += 1
        val c = cents(best); val n = ns(best).toDouble
        var i = 0
        while (i < x.length) { c(i) += (x(i) - c(i)) / n; i += 1 }
      }
    }
    KmState(cents.map(_.toSeq).toSeq, ns.toSeq)
  }

  /** vecs: (group, vec_id, embedding). One model per group; identical
    * call works on batch frames (the e21 gate form) and on readStream
    * (update mode — each trigger re-emits the group's current model).
    */
  def kmeansStream(vecs: DataFrame, k: Int): Dataset[(Long, KmState)] = {
    require(k > 0, "kmeansStream: k must be positive")
    val sp = vecs.sparkSession
    import sp.implicits._
    vecs.select(col("group").cast("long"), col("vec_id").cast("long"),
      col("embedding").cast("array<double>"))
      .as[(Long, Long, Seq[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (g: Long, rows: Iterator[(Long, Long, Seq[Double])],
         state: GroupState[KmState]) =>
          val next = fold(state.getOption, k, rows.toSeq)
          state.update(next)
          (g, next)
      }
  }

  /** Gate-friendly projection: one row per (centroid, dim) with the
    * assignment count — array-free so the driver's compare sorts it.
    */
  def centroidRows(model: Dataset[(Long, KmState)]): DataFrame =
    model.toDF("group", "state")
      .select(col("group"), posexplode(col("state.cents"))
        .as(Seq("centroid_id", "_c")), col("state.ns").as("_ns"))
      .withColumn("n_assigned",
        expr("_ns[centroid_id]").cast("long"))
      .select(col("group"), col("centroid_id").cast("long")
        .as("centroid_id"), col("n_assigned"),
        posexplode(col("_c")).as(Seq("dim_idx", "value")))
      .select(col("group"), col("centroid_id"),
        col("dim_idx").cast("long").as("dim_idx"),
        round(col("value"), 6).as("value"), col("n_assigned"))
}
