package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handling re-splits hot partitions of sort-merge joins
  * at runtime (exercised by q9_skewjoin), but at 100 TB two patterns still
  * want explicit salting: a Zipfian join key whose hot rows overflow even
  * a split partition, and aggregations with heavy per-group state. The
  * salt here is DETERMINISTIC (hash of a caller-chosen column, not
  * rand()): task retries and replays produce identical rows, which
  * nondeterministic salting silently breaks.
  */
object Skew {

  /** Inner equi-join with the skewed (big) side salted: each big-side row
    * gets one of `salts` deterministic sub-keys, the small side is
    * replicated across all of them, and the join runs on keys + salt —
    * splitting every hot key's rows over `salts` tasks. Result equals the
    * plain inner join on `keys` (each big row meets exactly the one
    * replica carrying its salt).
    *
    * `saltFrom` should be a big-side column that varies within a hot key
    * (a line number, an id); the replicated side pays a `salts`-fold
    * blow-up, so keep it the smaller input.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: Column, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = big.withColumn("_salt", pmod(hash(saltFrom), lit(salts)))
    val r = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }

  /** Pre-join skew report — the diagnostic that decides WHETHER to salt
    * before a hot key melts an executor: per-key counts reduce map-side
    * (one key exchange), the global (total, distinct) stats collapse to
    * ONE broadcast row, and the heaviest keys surface via the
    * bounded_top_k heap — k rows per partition cross the final shuffle,
    * never the key histogram. Output per heavy key: rank, n_rows,
    * skew (vs the mean key) and the salt count that would level it
    * (ceil(n/mean) ≈ how many tasks the key's rows should spread over —
    * feed it to [[saltedJoin]]). Ties resolve (count DESC, key ASC),
    * the heap's documented order.
    */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 5): DataFrame = {
    require(topN > 0, "skewReport: topN must be positive")
    graft.plans.BoundedTopK.register(df.sparkSession)
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(sum(col("n_rows")).as("_tot"),
      count(lit(1)).as("_nkeys"))
    val top = counts
      .agg(expr(s"bounded_top_k(struct(cast(n_rows as double), " +
        s"cast($keyCol as bigint)), $topN)").as("_tk"))
      .select(posexplode(col("_tk")).as(Seq("_r", "_e")))
      .select(col("_e.id").as(keyCol),
        col("_e.score").cast("long").as("n_rows"),
        (col("_r") + 1).cast("long").as("rank"))
    top.crossJoin(broadcast(stats))
      .select(col(keyCol), col("rank"), col("n_rows"),
        round(col("n_rows") / (col("_tot") / col("_nkeys")), 4)
          .as("skew"),
        ceil(col("n_rows") / (col("_tot") / col("_nkeys")))
          .cast("long").as("suggested_salts"))
  }

  /** Deterministic salt column for two-phase aggregations: groupBy
    * (keys :+ salt(...)) for the partial pass, then groupBy(keys) to
    * merge — spreads heavy per-group state (collect_list and friends)
    * over `salts` reducers.
    */
  def salt(saltFrom: Column, salts: Int): Column =
    pmod(hash(saltFrom), lit(salts))
}
