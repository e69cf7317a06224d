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
  /** Weight-proportional deterministic sampling — the token-budget draw
    * (P(keep_i) ∝ weight_i, e.g. document length, so the SAMPLE's token
    * mass tracks targetFrac of the corpus'): rate_i = min(1,
    * targetFrac * N * w_i / Z). The determinism trick at scale: the
    * weight column must be INTEGRAL (a length, a token count, a
    * pre-scaled score), so Z = Σw is an EXACT long in any aggregation
    * order — the q26 sorted-fold workaround is only needed for double
    * weights, and a sorted fold over millions of docs would collect an
    * unbounded array. Keep rule is the same retry-stable md5 draw as
    * stratifiedSample; stats reduce to ONE broadcast row.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     targetFrac: Double, salt: String = ""): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1,
      "weightedSample: targetFrac must be in (0, 1]")
    import org.apache.spark.sql.types._
    val wTyped = df.schema(weightCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType)
      .contains(wTyped),
      s"weightedSample: '$weightCol' is ${wTyped.simpleString} — weights " +
        "must be integral so the corpus sum is exact in any order " +
        "(pre-scale doubles to longs upstream)")
    val stats = df.agg(sum(col(weightCol)).as("_z"),
      count(lit(1)).as("_n"))
    df.crossJoin(broadcast(stats))
      .withColumn("_rate",
        least(lit(1.0), lit(targetFrac) * col("_n") * col(weightCol) /
          col("_z")))
      .where(hashDraw(col(idCol), salt).cast("double") <
        col("_rate") * 4294967296.0)
      .drop("_z", "_n", "_rate")
  }

  /** Corpus mixing (the Dolma/Pile recipe stage): re-weight the corpus
    * toward TARGET source proportions. `weights` are relative target
    * shares per source (unlisted sources get `defaultWeight`); with
    * total budget `targetFrac`·N rows, source s keeps
    * rate_s = min(1, targetFrac · N · (w_s/Σw) / n_s) via the same
    * retry-stable md5 draw as stratifiedSample. A source too small for
    * its share caps at rate 1 and the mix lands short — deliberate:
    * reallocating the shortfall is an iterative solve over the tiny
    * per-source table, not a corpus-scale concern (run it driver-side
    * on this function's stats if needed). Weights are INTEGRAL so Σw
    * and the per-source counts are exact in any aggregation order and
    * every engine computes the identical rate double (the t31 lesson);
    * stats reduce to one tiny aggregate + one broadcast row; the keep
    * rule stays a scan-level predicate.
    */
  def mixSample(df: DataFrame, sourceCol: String, idCol: String,
                weights: Map[String, Long], defaultWeight: Long,
                targetFrac: Double, salt: String = ""): DataFrame = {
    require(targetFrac > 0 && targetFrac <= 1,
      "mixSample: targetFrac must be in (0, 1]")
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      "mixSample: weights must be >= 0")
    val wCol = weights.foldLeft(lit(defaultWeight)) {
      case (acc, (k, v)) => when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", wCol)
    val totals = counts.agg(sum(col("_n")).as("_totn"),
      sum(col("_w")).as("_sw"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(sourceCol),
        least(lit(1.0), lit(targetFrac) * col("_totn") *
          (col("_w") / col("_sw")) / col("_n")).as("_rate"))
    df.join(broadcast(rates), sourceCol)
      .where(hashDraw(col(idCol), salt).cast("double") <
        col("_rate") * 4294967296.0)
      .withColumn("mix_rate", round(col("_rate"), 6))
      .drop("_rate")
  }

  /** Leakage-free train/test split — eval hygiene's answer to near
    * duplicates: a test doc with a near-copy in train leaks, so the
    * split must be assigned per DUPLICATE CLUSTER, never per doc.
    * Near-dup pairs (exact prefix-filtered n-gram Jaccard, the d4
    * detector) resolve to connected components; singletons form their
    * own cluster; every cluster draws its split with the same
    * deterministic md5 rule as stratifiedSample, so membership is
    * retry-stable and engine-reproducible. The invariant the spec
    * asserts: two docs in one cluster NEVER land in different splits.
    */
  def leakageFreeSplit(df: DataFrame, idCol: String, textCol: String,
                       testFrac: Double, salt: String = "",
                       n: Int = 3, threshold: Double = 0.5): DataFrame = {
    require(testFrac > 0 && testFrac < 1,
      "leakageFreeSplit: testFrac must be in (0, 1)")
    val pairs = Dedup.ngramJaccard(df, idCol, textCol, n, threshold,
      wordGrams = true)
    val clusters = Dedup.duplicateClusters(pairs)
      .select(col("id"), col("cluster"))
    df.select(col(idCol).as("id"))
      .join(clusters, Seq("id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("id")))
      .withColumn("split",
        when(hashDraw(col("cluster"), salt).cast("double") <
          testFrac * 4294967296.0, "test").otherwise("train"))
  }

  /** Deterministic global training-order shuffle with EXACT global
    * ranks — the "shuffle the corpus once per epoch" step every trainer
    * needs, without `orderBy` over the whole corpus collapsing into a
    * single reducer's sort or rand() breaking under task retries.
    *
    * Rank = position in md5(salt || id) order. Distributed exactly:
    * the first 3 hash hex digits are the row's bucket (4096 buckets; a
    * hex PREFIX, so bucket-numeric order == hash-lexicographic order),
    * per-bucket counts (<= 4096 metadata rows) fold into base offsets
    * with ONE unpartitioned window over that tiny frame, and the global
    * rank is base offset + within-bucket row_number. The corpus itself
    * crosses ONE hash exchange on the bucket key and sorts within
    * buckets only — two-phase ranking, the standard distributed
    * sort-rank shape. A different salt draws an independent permutation.
    */
  def shuffleRank(df: DataFrame, idCol: String,
                  salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .withColumn("_h", md5(concat(lit(salt), col(idCol).cast("string"))))
      .withColumn("_b", conv(substring(col("_h"), 1, 3), 16, 10)
        .cast("int"))
    val offsets = keyed.groupBy(col("_b")).agg(count(lit(1)).as("_c"))
      .withColumn("_off",
        coalesce(sum(col("_c")).over(Window.orderBy(col("_b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("_c")
    keyed
      .join(broadcast(offsets), Seq("_b"))
      .withColumn("shuffle_rank",
        col("_off") + row_number().over(Window.partitionBy(col("_b"))
          .orderBy(col("_h"), col(idCol))) - 1)
      .drop("_h", "_b", "_off")
  }

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
