package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data mixing.
  *
  * A data-mixing recipe assigns each stratum (language, source, domain)
  * a sampling rate; the sampler must be deterministic (reruns and
  * retried tasks pick identical rows — Spark's rand()-based sample() is
  * not stable under retries), uniform within a stratum, and independent
  * across salts (two mixes drawn with different salts overlap
  * proportionally, not identically).
  *
  * Keep rule: md5(salt || id) interpreted through its first 8 hex chars
  * as a uniform draw in [0, 2^32) — < rate * 2^32 keeps the row. md5
  * (not xxhash64) so the DuckDB oracle reproduces the exact row set.
  * Pure per-row expression: no shuffle, full codegen, predicate sits
  * directly on the scan.
  */
object Sampling {

  /** Uniform [0, 2^32) draw from (salt, id) — portable to SQL. */
  def hashDraw(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 8),
      16, 10).cast("long")

  /** Per-stratum deterministic sample: `rates` maps stratum value ->
    * keep probability; strata not listed keep `defaultRate`.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 0.0,
                       salt: String = ""): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.where(hashDraw(col(idCol), salt).cast("double") <
      rate * 4294967296.0)
  }

  /** Temperature-based mixture sampling (the multilingual-training
    * recipe: draw stratum s with probability ∝ count_s^T, T < 1 lifting
    * low-resource strata): per-stratum rates are DERIVED from the data —
    * rate_s = min(1, targetFrac * N * count_s^T / Z / count_s) with
    * Z = Σ count_s^T — then applied with the same deterministic md5 keep
    * rule as stratifiedSample.
    *
    * Determinism contract: count_s^T rounds to 6 dp, Z folds over the
    * strata in stratum-sort order (Σ of arbitrary doubles is
    * order-sensitive; a groupBy sum would be nondeterministic in the
    * last ulp), and the final rate rounds to 6 dp before the threshold
    * compare — the SQL oracle replays the identical fold. Stats reduce
    * to ONE broadcast row; the keep rule stays a scan-level predicate.
    */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        temperature: Double, targetFrac: Double,
                        salt: String = ""): DataFrame = {
    // NULL-stratum rows can never match the rate join below, so they
    // must not count toward N or Z either — otherwise every stratum's
    // rate is diluted and the realized fraction silently undershoots
    // targetFrac. They are excluded from the sample entirely.
    val dfNn = df.where(col(stratumCol).isNotNull)
    val perStratum = dfNn.groupBy(col(stratumCol).as("_s"))
      .agg(count(lit(1)).as("_cnt"))
      .select(col("_s"), col("_cnt"),
        round(pow(col("_cnt"), temperature), 6).as("_w"))
    val z = perStratum
      .agg(aggregate(
        array_sort(collect_list(struct(col("_s"), col("_w")))),
        lit(0.0), (acc, e) => acc + e.getField("_w")).as("_z"),
        sum(col("_cnt")).as("_n"))
    val rated = perStratum.crossJoin(broadcast(z))
      .select(col("_s"),
        round(least(lit(1.0),
          lit(targetFrac) * col("_n") * col("_w") / col("_z") /
            col("_cnt")), 6).as("_rate"))
    dfNn.join(broadcast(rated), col(stratumCol) === col("_s"))
      .where(hashDraw(col(idCol), salt).cast("double") <
        col("_rate") * 4294967296.0)
      .drop("_s", "_rate")
  }
}
