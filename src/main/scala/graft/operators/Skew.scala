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

  /** Deterministic salt column for two-phase aggregations: groupBy
    * (keys :+ salt(...)) for the partial pass, then groupBy(keys) to
    * merge — spreads heavy per-group state (collect_list and friends)
    * over `salts` reducers.
    */
  def salt(saltFrom: Column, salts: Int): Column =
    pmod(hash(saltFrom), lit(salts))
}
