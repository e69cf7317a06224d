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
}
