package graft.operators

import org.apache.spark.sql.DataFrame

/** Frees the executor blocks behind a `localCheckpoint()`ed DataFrame.
  *
  * `Dataset.unpersist` is a NO-OP for checkpoints: it routes through the
  * CacheManager, which only tracks `persist()`/`cache()` registrations,
  * while localCheckpoint persists the underlying RDD directly (verified
  * against the Spark 4.1.2 runtime). Iterative operators (connected
  * components, k-means, PageRank) that checkpoint per round must free the
  * superseded round's RDD explicitly or rely on driver GC + the
  * ContextCleaner — unbounded in a long-lived session. The checkpointed
  * RDD sits in the plan's `LogicalRDD` leaf; unpersist it there.
  */
private[graft] object Checkpoints {

  /** Pin an iterative-round intermediate, honoring
    * `spark.graft.iterative.checkpoint`:
    *
    *  - `local` (default): `localCheckpoint()` — executor-local,
    *    non-replicated blocks. Fastest, and the right local-mode
    *    trade-off, but on a real cluster an executor loss mid-iteration
    *    kills the job (truncated lineage cannot recompute).
    *  - `replicated`: localCheckpoint at MEMORY_AND_DISK_2 — survives a
    *    single executor loss at the cost of one extra block copy.
    *  - `reliable`: `checkpoint()` to the configured
    *    `SparkContext.setCheckpointDir` — survives any executor loss;
    *    the guide §5 answer for long-chain iteration at 100 TB.
    *
    * Every iterative operator (connected components, label propagation,
    * PageRank, BFS) routes its per-round pins through here, so cluster
    * deployments flip ONE conf instead of patching operators. Zero cost
    * when unset (identical localCheckpoint call).
    */
  def pin(df: DataFrame): DataFrame =
    df.sparkSession.conf
      .getOption("spark.graft.iterative.checkpoint")
      .getOrElse("local") match {
      case "reliable" => df.checkpoint()
      case "replicated" => df.localCheckpoint(eager = true,
        storageLevel = org.apache.spark.storage.StorageLevel
          .MEMORY_AND_DISK_2)
      case _ => df.localCheckpoint()
    }

  /** Frees `df`'s blocks iff `df` IS a checkpoint (its plan root is the
    * LogicalRDD). Deliberately NOT a leaf walk: a derived frame's leaves
    * can be checkpoints other rounds still need (PageRank's shared
    * degree table), and freeing a localCheckpoint that anything still
    * reads is unrecoverable — the truncated lineage cannot recompute.
    * No-op on non-checkpointed frames, so round-1 "previous" frames
    * (built straight from the inputs) pass through safely.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD
        if !df.sparkSession.sparkContext.isStopped =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
