package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: build a bit set from the (filtered) build
  * side's join keys and pre-filter the probe side before any join — the
  * classic semi-join reduction that, at 100 TB, keeps the probe side's
  * shuffle from carrying rows the join would discard anyway. Spark's AQE
  * can inject runtime bloom filters itself (`InjectRuntimeFilter`); this
  * operator is the explicit, engine-independent form with md5 bit math an
  * external SQL engine reproduces exactly, so false-positive accounting
  * is oracle-checkable rather than opaque.
  *
  * The bit set lives as a DataFrame of set bit positions (distinct longs,
  * <= `bits` rows) that BROADCASTS to the probe scan; membership = all
  * `hashes` positions present. No driver-side collect, no UDF.
  */
object BloomJoin {

  private def bitOf(j: Int, key: Column, bits: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), key.cast("string"))),
      1, 7), 16, 10).cast("long"), lit(bits))

  private def bitArray(key: Column, bits: Int, hashes: Int): Column =
    array_distinct(array((0 until hashes).map(j => bitOf(j, key, bits)): _*))

  /** Distinct set-bit positions for the build side's keys. */
  def buildBits(keys: DataFrame, keyCol: String, bits: Int,
                hashes: Int): DataFrame =
    keys.select(explode(bitArray(col(keyCol), bits, hashes)).as("bit"))
      .distinct()

  /** Keys of `probe` that pass the bloom membership test (supersets the
    * true join keys; false positives bounded by the fill ratio ^ hashes).
    */
  def candidateKeys(probe: DataFrame, keyCol: String, bitsDf: DataFrame,
                    bits: Int, hashes: Int): DataFrame = {
    val pk = probe.select(col(keyCol)).distinct()
      .select(col(keyCol), bitArray(col(keyCol), bits, hashes).as("_ps"))
      .select(col(keyCol), size(col("_ps")).as("_n"),
        explode(col("_ps")).as("bit"))
    pk.join(broadcast(bitsDf), Seq("bit"))
      .groupBy(col(keyCol), col("_n"))
      .agg(count(lit(1)).as("_hits"))
      .where(col("_hits") === col("_n"))
      .select(col(keyCol))
  }

  /** One-row accounting of the pruning quality: total probe rows, rows
    * passing the bloom, rows truly joining, and the false-positive
    * surplus the join itself would have filtered.
    */
  def pruneStats(probe: DataFrame, build: DataFrame, keyCol: String,
                 bits: Int = 65536, hashes: Int = 3): DataFrame = {
    val bitsDf = buildBits(build, keyCol, bits, hashes)
    // Two key-only scans of the fact table (down from four full-width
    // passes: a count plus two semi-join counts plus a distinct): one
    // feeds the per-key row counts (partial-aggregated map-side), one
    // collapses to the distinct keys candidateKeys tests. Fusing both
    // into a single linear chain was MEASURED SLOWER (3.3s vs 0.25s at
    // sf0.1): the explode's implicit size()>0 filter — which wraps the
    // 3-hash md5 bit math — pushes below the aggregate onto every raw
    // row. PlanSpec pins the two-scan shape.
    val perKey = probe.groupBy(col(keyCol)).agg(count(lit(1)).as("_rows"))
    val cand = candidateKeys(perKey, keyCol, bitsDf, bits, hashes)
      .withColumn("_pass", lit(true))
    val tru = build.select(col(keyCol)).distinct()
      .withColumn("_true", lit(true))
    perKey
      .join(cand, Seq(keyCol), "left")
      .join(tru, Seq(keyCol), "left")
      .agg(
        coalesce(sum(col("_rows")), lit(0L)).as("n_fact"),
        coalesce(sum(when(col("_pass"), col("_rows")).otherwise(0L)),
          lit(0L)).as("n_candidates"),
        coalesce(sum(when(col("_true"), col("_rows")).otherwise(0L)),
          lit(0L)).as("n_true"))
      .select(col("n_fact"), col("n_candidates"), col("n_true"),
        (col("n_candidates") - col("n_true")).as("n_false_pos"))
  }
}
