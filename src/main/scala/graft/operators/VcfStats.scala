package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Variant-level QC statistics: the bcftools-stats / plink-mendel style
  * summaries a cohort pipeline runs right after VCF normalization
  * (reference context: vcf_filter_fix.py emits the normalized rows these
  * summaries consume; the reference itself defers QC to bcftools).
  *
  * Scale: [[variantStats]] is one groupBy(chrom) of conditional sums —
  * map-side partials reduce each scan task to a handful of longs per
  * chromosome, the only exchange is ~25 tiny rows. [[mendelViolations]]
  * shuffles the genotype matrix once on (variant, sample) for each of the
  * two parent joins with the trio table broadcast — no per-sample driver
  * loop, so a 100k-sample biobank cohort partitions across executors.
  */
object VcfStats {

  private def isSnp: Column =
    length(col("ref")) === 1 && length(col("alt")) === 1

  /** Transition (purine<->purine / pyrimidine<->pyrimidine) SNV — the
    * ti/tv ratio's numerator; ~2.0-2.1 genome-wide is the classic
    * sanity check for call-set quality.
    */
  private def isTransition: Column =
    (col("ref") === "A" && col("alt") === "G") ||
      (col("ref") === "G" && col("alt") === "A") ||
      (col("ref") === "C" && col("alt") === "T") ||
      (col("ref") === "T" && col("alt") === "C")

  /** Per-chromosome variant-class counts over normalized (one row per
    * ALT allele) variants: SNVs, insertions, deletions, MNPs,
    * transitions/transversions and the ti/tv ratio (null when tv = 0;
    * rounded to 5 decimals so the SQL oracle matches bit-exactly).
    */
  def variantStats(vcfNorm: DataFrame): DataFrame = {
    val snp = isSnp
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    vcfNorm.groupBy(col("chrom"))
      .agg(
        count(lit(1)).as("n_variants"),
        cnt(snp).as("n_snp"),
        cnt(length(col("alt")) > length(col("ref"))).as("n_ins"),
        cnt(length(col("alt")) < length(col("ref"))).as("n_del"),
        cnt(!snp && length(col("alt")) === length(col("ref")))
          .as("n_mnp"),
        cnt(snp && isTransition).as("n_ti"),
        cnt(snp && !isTransition).as("n_tv"))
      .withColumn("ti_tv",
        when(col("n_tv") > 0,
          round(col("n_ti").cast("double") / col("n_tv"), 5)))
  }

  /** ALT-allele dosage of a diploid genotype string ("a|b" or "a/b",
    * post-[[graft.sources.Vcf.normalize]] so alleles are 0/1/'.'):
    * number of '1' alleles, null when any allele is missing.
    */
  def dosage(gt: Column): Column = {
    val alleles = split(gt, "[|/]")
    when(array_contains(alleles, "."), lit(null).cast("int"))
      .otherwise(size(filter(alleles, _ === "1")))
  }

  /** plink `--het`-style per-sample heterozygosity / inbreeding: observed
    * homozygous count O, expected homozygous count E under HWE with
    * Nei's small-sample correction (per variant,
    * 1 − 2p(1−p)·an/(an−1), p from the cohort's called alleles), and
    * the method-of-moments inbreeding coefficient
    * F = (O − E)/(N − E) — excess homozygosity flags inbreeding or
    * contamination-free DNA, deficit flags sample contamination.
    * Monomorphic sites contribute identically to O, E and N (term = 1),
    * so including them is exact, not a bias.
    *
    * Determinism contract: the per-variant E term is quantized to a
    * 1e-9 long — its doubles (one divide for p, the pinned product
    * chain, one divide for the correction) are IEEE-identical on both
    * engines because every op is correctly rounded and the op ORDER is
    * pinned — and per-sample sums are exact integer folds. The only
    * post-aggregation doubles are two divides and the final ratio, with
    * the +1e-9-before-round(5) tie nudge (and +0.0 signed-zero fix)
    * both engines share. F is null when N·1e9 == ΣE9 exactly (the
    * single-variant degenerate plink reports nan).
    *
    * Plan: one variant-keyed conditional-sum groupBy (ac/an partials),
    * the per-call frame re-joins it ON THE SAME KEY (exchange reuse),
    * then ONE sample-keyed groupBy of integer partials.
    */
  def hetStats(gts: DataFrame): DataFrame = {
    val rows = gts
      .select(col("varId"), col("sample"), dosage(col("gt")).as("_d"))
      .where(col("_d").isNotNull)
    val vstats = rows.groupBy("varId")
      .agg(sum(col("_d")).cast("long").as("ac"),
        (count(lit(1)) * 2).as("an"))
    val p = col("ac").cast("double") / col("an").cast("double")
    val corr = col("an").cast("double") /
      (col("an").cast("double") - lit(1.0))
    val e9 = vstats.select(col("varId"),
      floor((lit(1.0) - lit(2.0) * p * (lit(1.0) - p) * corr) * 1e9 +
        lit(0.5)).cast("long").as("e9"))
    val perSample = rows.join(e9, Seq("varId"))
      .groupBy("sample")
      .agg(count(lit(1)).as("n_nm"),
        sum(when(col("_d") =!= 1, 1L).otherwise(0L)).as("o_hom"),
        sum(col("e9")).cast("long").as("e9s"))
    perSample.select(
      col("sample"), col("o_hom"),
      round(col("e9s") / lit(1e9) + lit(1e-9), 5).as("e_hom"),
      col("n_nm"),
      when(col("n_nm") * lit(1000000000L) === col("e9s"),
        lit(null).cast("double"))
        .otherwise(round(
          (col("o_hom") - col("e9s") / lit(1e9)) /
            (col("n_nm") - col("e9s") / lit(1e9)) + lit(1e-9), 5) +
          lit(0.0)).as("f"))
  }

  /** plink `--genome`-style IBS sharing per sample pair: over variants
    * where BOTH samples are called, the identity-by-state class counts
    * (|dA−dB| = 2 → ibs0, 1 → ibs1, 0 → ibs2) and the DST similarity
    * (ibs2 + 0.5·ibs1)/n — the relatedness/duplicate-sample screen
    * every cohort QC runs. Plan: ONE variant-keyed self-join (pairs
    * generated where the variant's rows already sit), then one
    * pair-keyed groupBy of conditional sums — three longs per pair per
    * task. S²·V pair rows is THE quadratic popgen cost; plink's own
    * prescription applies at biobank scale — LD-prune the variant panel
    * first — and the sample dimension blocks (or routes through d5's
    * embedding-LSH on genotype sketches) when S² itself is the problem.
    */
  def ibsPairs(gts: DataFrame): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def side(n: String) = gts
      .select(col("varId"), col("sample").as(s"sample_$n"),
        dosage(col("gt")).as(s"_d$n"))
      .where(col(s"_d$n").isNotNull)
    side("a").join(side("b"), "varId")
      .where(col("sample_a") < col("sample_b"))
      .withColumn("_df", abs(col("_da") - col("_db")))
      .groupBy("sample_a", "sample_b")
      .agg(count(lit(1)).as("n_sites"),
        cnt(col("_df") === 2).as("ibs0"),
        cnt(col("_df") === 1).as("ibs1"),
        cnt(col("_df") === 0).as("ibs2"))
      .withColumn("dst",
        round((col("ibs2") + lit(0.5) * col("ibs1")) / col("n_sites"), 5))
  }

  /** KING-robust kinship per sample pair (Manichaikul et al. 2010, the
    * between-family estimator plink2 `--make-king` / hail `king()` use):
    * over variants where BOTH samples are called,
    *   φ̂ = 1/2 + (2·N_Aa,Aa − 4·N_AA,aa − N_Aa,i − N_Aa,j)
    *              / (4·min(N_Aa,i, N_Aa,j))
    * — duplicates/MZ twins ≈ 0.5, parent-child/full-sibs ≈ 0.25,
    * unrelated ≈ 0. Unlike DST it needs no allele frequencies, so it is
    * robust to population structure — the reason cohort QC
    * (`samples.tsv` relatedness screens feeding ProHap's haplotype
    * counting) prefers it. Plan: the exact [[ibsPairs]] shape — ONE
    * variant-keyed self-join, one pair-keyed groupBy whose map-side
    * partials ship five longs per pair; the φ arithmetic runs on the
    * aggregated frame only. The S²·V caveat and its LD-prune/blocking
    * prescriptions from [[ibsPairs]] apply unchanged.
    * φ is null when either sample has zero hets over shared sites (the
    * estimator is undefined; plink2 emits nan there too).
    */
  def kingKinship(gts: DataFrame): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    def side(n: String) = gts
      .select(col("varId"), col("sample").as(s"sample_$n"),
        dosage(col("gt")).as(s"_d$n"))
      .where(col(s"_d$n").isNotNull)
    val da = col("_da"); val db = col("_db")
    val minHet = least(col("n_het_a"), col("n_het_b"))
    side("a").join(side("b"), "varId")
      .where(col("sample_a") < col("sample_b"))
      .groupBy("sample_a", "sample_b")
      .agg(count(lit(1)).as("n_sites"),
        cnt(da === 1 && db === 1).as("n_both_het"),
        cnt((da - db) === 2 || (db - da) === 2).as("n_opp_hom"),
        cnt(da === 1).as("n_het_a"),
        cnt(db === 1).as("n_het_b"))
      .withColumn("kinship",
        when(minHet > 0, round(
          (lit(2) * col("n_both_het") - lit(4) * col("n_opp_hom")
            - col("n_het_a") - col("n_het_b"))
            / (lit(4) * minHet) + lit(0.5), 5)))
  }

  /** plink `--make-grm` / GCTA-style genetic relationship matrix: for
    * sample pair (a,b), G_ab = (1/V)·Σ_v z_va·z_vb where z is the
    * variant-standardized ALT dosage (mean-imputed at missing calls, so
    * z = 0 there — the GCTA convention), p estimated from called
    * samples, monomorphic variants dropped (sd = 0). The GRM is the
    * input to genotype PCA (population-structure axes), mixed-model
    * association and heritability estimation.
    *
    * Cross-engine exactness without sorted folds: z is built from
    * integer dosages by correctly-rounded IEEE ops only (no
    * reassociation), so both engines hold bit-identical doubles; it is
    * then SCALED TO AN INTEGER (round(z·10^6) as long), making every
    * pair partial Σ z6·z6 an exact integer sum — order-independent in
    * any aggregation plan — with the single double division/round
    * deferred to the aggregated frame. d11's sorted-fold alternative
    * exists for when 6 decimals aren't enough; they are here.
    *
    * Plan: one groupBy(varId) for the per-variant stats, one varId-keyed
    * join back (co-partitioned with the pair join's own exchange), then
    * the [[ibsPairs]] self-join + pair-keyed sum — one long per pair per
    * task; products are summed as decimal(38,0) so biobank-scale V
    * cannot overflow. The S²·V caveat and the LD-prune prescription from
    * [[ibsPairs]] apply; the diagonal is included (a GRM is S×S).
    */
  def grmPairs(gts: DataFrame): DataFrame = {
    val d = dosage(col("gt"))
    val stats = gts
      .select(col("varId"), d.as("_d"))
      .groupBy("varId")
      .agg(count(col("_d")).as("_n"), sum(col("_d")).as("_sd"))
      .withColumn("_p", col("_sd") / (lit(2.0) * col("_n")))
      .where(col("_p") > 0 && col("_p") < 1)
      .select("varId", "_p")
    val z = gts
      .join(stats, Seq("varId"))
      .withColumn("_z", when(d.isNull, lit(0.0))
        .otherwise((d - lit(2.0) * col("_p"))
          / sqrt(lit(2.0) * col("_p") * (lit(1.0) - col("_p")))))
      .select(col("varId"), col("sample"),
        round(col("_z") * 1e6).cast("long").as("_z6"))
    val nVar = stats.count()
    z.select(col("varId"), col("sample").as("sample_a"),
        col("_z6").as("_za"))
      .join(z.select(col("varId"), col("sample").as("sample_b"),
        col("_z6").as("_zb")), Seq("varId"))
      .where(col("sample_a") <= col("sample_b"))
      .groupBy("sample_a", "sample_b")
      .agg(sum((col("_za") * col("_zb")).cast("decimal(38,0)"))
        .as("_s"))
      .select(col("sample_a"), col("sample_b"),
        round(col("_s").cast("double") / 1e12 / nVar, 5).as("grm"))
  }

  /** Genotype PCA from [[grmPairs]]' GRM: top-k eigenpairs by power
    * iteration with deflation. The S×S matrix is metadata-scale by the
    * operator's own contract (plink/GCTA materialize the GRM too), so
    * the eigen solve runs on the driver; the data-scale work — V·S
    * standardized products — stayed distributed in [[grmPairs]].
    * Deterministic: fixed iteration count, a fixed IRREGULAR start
    * vector (Knuth-hash per index — a uniform start is exactly
    * orthogonal to the leading eigenvector of any balanced two-block
    * GRM, the most common population split, and power iteration never
    * leaves it), sign fixed so the largest-|loading| entry is positive.
    * Returns (sample, pc, loading, eigenvalue).
    */
  def pcaFromGrm(grm: DataFrame, topK: Int = 2,
                 iters: Int = 50): DataFrame = {
    val rows = grm.collect()
    val samples = rows.flatMap(r => Seq(r.getString(0), r.getString(1)))
      .distinct.sorted
    val idx = samples.zipWithIndex.toMap
    val s = samples.length
    val m = Array.ofDim[Double](s, s)
    rows.foreach { r =>
      val (a, b, g) = (idx(r.getString(0)), idx(r.getString(1)),
        r.getDouble(2))
      m(a)(b) = g; m(b)(a) = g
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(String, Int, Double, Double)]
    for (k <- 1 to math.min(topK, s)) {
      var v = Array.tabulate(s)(i =>
        ((i * 2654435761L) % 1000L).toDouble / 1000.0 + 0.5)
      val n0 = math.sqrt(v.map(x => x * x).sum)
      v = v.map(_ / n0)
      var lambda = 0.0
      for (_ <- 1 to iters) {
        val w = Array.tabulate(s)(i =>
          (0 until s).map(j => m(i)(j) * v(j)).sum)
        val n = math.sqrt(w.map(x => x * x).sum)
        if (n > 1e-12) { v = w.map(_ / n); lambda = n }
      }
      val top = v.indices.maxBy(i => math.abs(v(i)))
      if (v(top) < 0) v = v.map(x => -x)
      for (i <- 0 until s)
        out += ((samples(i), k, v(i), lambda))
      for (i <- 0 until s; j <- 0 until s)
        m(i)(j) -= lambda * v(i) * v(j)
    }
    val sp = grm.sparkSession
    import sp.implicits._
    out.toSeq.toDF("sample", "pc", "loading", "eigenvalue")
  }

  /** Distributed genotype PCA from [[grmPairs]]' GRM: top-k eigenpairs
    * by power iteration with deflation, run ENTIRELY as DataFrame ops —
    * no driver-side matrix (that's [[pcaFromGrm]], kept for the
    * metadata-scale case and as the parity check). Per round: one
    * edge-list join (GRM row x vector) + one per-row partial-aggregated
    * sum, the d11 iterative-matmul contract — the same shape at 6
    * samples and at a 500k-sample biobank GRM, where the S^2/2 edge list
    * is the data-scale frame and the vector (S rows) broadcasts.
    *
    * Determinism contract (every sum order-independent, every scalar op
    * IEEE-replayable by the SQL oracle's recursive walk):
    *   - GRM entries quantized to 1e-5 longs (they ARE 5-dp rounded),
    *     the iterate to 1e-9 longs, the eigenvalue to 1e-5;
    *   - matmul row sums and norm sums are exact decimal(38,0) folds of
    *     long products — partition order cannot change a ulp;
    *   - the only doubles are one sqrt + one divide per row per round,
    *     in a pinned op order the oracle replays verbatim;
    *   - nearest-integer is floor(x + 0.5) on BOTH engines (Spark
    *     round() is BigDecimal HALF_UP, DuckDB's is half-away — they
    *     disagree on negative .5 ties; floor(x+0.5) cannot).
    * Exactness bound: |wraw| <= 1e14·lambda_max and sum(wq^2) <=
    * S·(1e14·lambda_max)^2 must fit decimal(38,0) -> valid to S ~ 1e4
    * with lambda_max ~ 1e3; beyond that drop the vector scale to 1e6.
    *
    * Start vector, iteration count, deflation (G - λvv^T applied as
    * Mv - λ·v1·(v1^T v), never materializing the dense update) and the
    * largest-|loading|-positive sign fix all mirror [[pcaFromGrm]];
    * QcSpec pins the two within 1e-3 at fixture scale.
    *
    * Each round localCheckpoints the S-row vector — bounded lineage,
    * linear (not exponential) recompute; topK·iters tiny jobs total.
    */
  def grmPcaDistributed(grm: DataFrame, topK: Int = 2,
                        iters: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    // Stats-rebasing checkpoint for the ITERATED vector frames:
    // localCheckpoint PRESERVES the origin plan's size estimate, so
    // each round's join-size products compound into a size estimate
    // whose DIGIT COUNT grows exponentially with the iteration — by
    // round ~40 Catalyst's SizeInBytesOnlyStatsPlanVisitor was doing
    // million-digit BigInteger products for minutes (found via a
    // thread dump). Round-tripping the materialized rows through the
    // RDD resets stats to the default; every join that should
    // broadcast carries an explicit broadcast() hint, so planning
    // never needs those stats. S rows per round — the re-encode is
    // noise.
    def rebase(df: DataFrame): DataFrame = {
      val c = df.localCheckpoint()
      c.sparkSession.createDataFrame(c.rdd, c.schema)
    }
    val half = grm.select(col("sample_a"), col("sample_b"),
      floor(col("grm") * 1e5 + lit(0.5)).cast("long").as("g5"))
    val edges = half
      .select(col("sample_a").as("i"), col("sample_b").as("j"), col("g5"))
      .unionByName(half.where(col("sample_a") =!= col("sample_b"))
        .select(col("sample_b").as("i"), col("sample_a").as("j"),
          col("g5")))
      .localCheckpoint()
    // rank assignment: one window over S rows — metadata-scale by the
    // GRM's own contract (the S x S matrix itself is the big frame)
    val ranks = edges.select(col("i").as("sample")).distinct()
      .withColumn("rank",
        row_number().over(Window.orderBy("sample")) - lit(1))
      .localCheckpoint()
    val raw0 = ranks.select(col("sample"), col("rank"),
      (pmod(col("rank").cast("long") * lit(2654435761L), lit(1000L))
        + lit(500L)).as("raw3"))
    val n0 = raw0
      .agg(sum((col("raw3") * col("raw3")).cast(dec)).as("sq0"))
      .select(sqrt(col("sq0").cast("double")).as("nrm"))
    val v0 = raw0.crossJoin(broadcast(n0))
      .select(col("sample"), col("rank"),
        floor(col("raw3").cast("double") / col("nrm") * 1e9 + lit(0.5))
          .cast("long").as("v9"))
    val v0c = rebase(v0)

    // priors: one (sample, rank, pv9, lam5) frame per found PC — the
    // eigenvalue rides as a column so deflation needs NO per-round
    // broadcast of a 1-row lam frame
    var priors = List.empty[DataFrame]
    var outs = List.empty[DataFrame]
    for (k <- 1 to topK) {
      var v = v0c
      var lastLam: DataFrame = null
      for (it <- 1 to iters) {
        val w0 = edges
          .join(broadcast(v.select(col("sample").as("j"), col("v9"))),
            Seq("j"))
          .groupBy(col("i").as("sample"))
          .agg(sum((col("g5") * col("v9")).cast(dec)).as("wraw"))
        // scalars (deflation dot product, vector norm) fold as
        // SINGLE-PARTITION windows over the S-row vector frame — the
        // vector is metadata-scale by the GRM contract, and a window
        // scalar costs zero extra JOBS where a broadcast 1-row agg
        // costs one per round (with the stats rebase: bench 9.3 ->
        // 7.9 s, parity spec 95 -> 36 s; the remaining wall is the 40
        // sequential round barriers power iteration inherently has).
        // Window sums are the same order-independent decimal folds.
        val all = Window.partitionBy()
        var wd = w0.withColumn("wd", col("wraw").cast("double"))
        for (pv <- priors) {
          wd = wd
            .join(broadcast(
              pv.select(col("sample"), col("pv9"), col("lam5"))),
              Seq("sample"))
            .join(broadcast(v.select(col("sample"), col("v9"))),
              Seq("sample"))
            .withColumn("dotp",
              sum((col("pv9") * col("v9")).cast(dec)).over(all))
            // corr_raw = (lam5/1e5)·(pv9/1e9)·(dot/1e18) × 1e14 raw
            // scale = lam5·pv9·dot / 1e18
            .withColumn("wd", col("wd") -
              (col("lam5").cast("double") * col("pv9").cast("double")) *
                (col("dotp").cast("double") / lit(1e18)))
            .drop("pv9", "v9", "dotp", "lam5")
        }
        val wq = wd.select(col("sample"),
          floor(col("wd") + lit(0.5)).cast("long").as("wq"))
        v = wq
          .withColumn("nrm",
            sqrt(sum(col("wq").cast("decimal(19,0)") *
              col("wq").cast("decimal(19,0)")).over(all).cast("double")))
          .select(col("sample"),
            floor(col("wq").cast("double") / col("nrm") * 1e9 + lit(0.5))
              .cast("long").as("v9"),
            col("nrm"))
          .join(broadcast(ranks), Seq("sample"))
        v = rebase(v)
        lastLam = v.agg(max(col("nrm")).as("n"))
          .select(floor(col("n") / 1e9 + lit(0.5)).cast("long").as("lam5"))
      }
      // sign fix: first max-|v9| in rank order decides; flip is
      // deflation-invariant (λvv^T is even in v)
      val sgnRow = v.orderBy(abs(col("v9")).desc, col("rank").asc)
        .limit(1)
        .select(when(col("v9") < 0, lit(-1L)).otherwise(lit(1L)).as("sgn"))
      val fixed = v.crossJoin(broadcast(sgnRow))
        .crossJoin(broadcast(lastLam))
        .select(col("sample"), col("rank"),
          (col("v9") * col("sgn")).as("pv9"), col("lam5"))
      val fixedC = rebase(fixed)
      priors = priors :+ fixedC
      // +1e-10 pre-round: pv9 is a 1e-9-grid long, so a 6-dp tie is
      // exactly …500e-9 — Spark HALF_UPs the shortest decimal repr
      // while DuckDB rounds the binary double (the qualityScore
      // hazard); the nudge shifts ties off the boundary identically.
      // +0.0 post-round: a negative tie nudged toward zero can round
      // to -0.0 on one engine and 0.0 on the other (the verify-skill
      // signed-zero gotcha).
      outs = outs :+ fixedC
        .select(col("sample"), lit(k).as("pc"),
          (round(col("pv9").cast("double") / 1e9 + lit(1e-10), 6) +
            lit(0.0)).as("loading"),
          round(col("lam5").cast("double") / 1e5, 6).as("eigenvalue"))
    }
    outs.reduce(_.unionByName(_))
  }

  /** plink `--indep-pairwise`-style greedy LD pruning — THE
    * prescription [[ibsPairs]]/[[grmPairs]]/[[kingKinship]] cite for
    * biobank-scale pair scans: thin the variant panel so no two kept
    * variants within `maxDist` correlate above `r2Threshold`. Greedy
    * keep-earliest contract (deterministic): walking each chromosome in
    * (pos, varId) order, a variant is PRUNED iff it has r² ≥ threshold
    * against an earlier variant that itself survived — so chains
    * A~B, B~C (A≁C) keep A and C, drop B, exactly plink's sequential
    * scan shape (plink's lower-MAF tie-drop and window stepping are the
    * documented divergences).
    *
    * Plan: the [[ldPairs]] windowed pair join supplies the high-LD
    * pairs; the sequential recursion then runs as ONE per-chromosome
    * array fold (aggregate + exists over the collected (pos, varId)
    * list) — chromosomes are the parallelism unit, mirroring plink's
    * own per-chrom scan; at biobank variant counts, chunk the fold by
    * plink-style windows upstream. Output: every variant with its
    * `kept` verdict.
    */
  def ldPrune(gts: DataFrame, maxDist: Long, r2Threshold: Double,
              binSize: Long = 10000L): DataFrame = {
    val vars = gts.select(col("chrom"), col("pos"), col("varId"))
      .distinct()
    val vt = vars.schema("varId").dataType.sql
    val hi = ldPairs(gts, maxDist, binSize)
      .where(col("r2").isNotNull && col("r2") >= r2Threshold)
      .groupBy("chrom")
      .agg(collect_list(struct(col("varId1").as("a"),
        col("varId2").as("b"))).as("_prs"))
    val keptArr = vars
      .groupBy("chrom")
      .agg(array_sort(collect_list(struct(col("pos"), col("varId"))))
        .as("_vs"))
      .join(hi, Seq("chrom"), "left")
      .withColumn("_prs",
        coalesce(col("_prs"), array().cast(s"array<struct<a:$vt,b:$vt>>")))
      .select(col("chrom"),
        aggregate(col("_vs"), array().cast(s"array<$vt>"),
          (acc, v) => when(
            exists(col("_prs"), p =>
              p.getField("b") === v.getField("varId") &&
                array_contains(acc, p.getField("a"))), acc)
            .otherwise(concat(acc, array(v.getField("varId")))))
          .as("_kept"))
    vars.join(keptArr, Seq("chrom"), "left")
      .select(col("chrom"), col("pos"), col("varId"),
        coalesce(array_contains(col("_kept"), col("varId")), lit(false))
          .as("kept"))
  }

  /** vcftools `--window-pi`-style windowed nucleotide diversity: per
    * site π = c_ref·c_alt / C(c_total, 2) over CALLED alleles (the
    * allele-count form — integers until the one division), summed per
    * (chrom, window of `binSize` bp). The genome-scan statistic behind
    * diversity maps and selective-sweep screens (low-π valleys).
    *
    * Plan: ONE conditional-sum groupBy(varId) for the allele counts
    * (the gen_hwe shape), then one (chrom, window) aggregation. The
    * per-window double sum folds in (pos, varId) order (the t17
    * sorted-fold contract) so an independent engine reproduces the
    * hash; windows hold bounded variant counts, so the fold array is
    * bounded — at biobank scale the windows themselves are the
    * parallelism unit.
    */
  def windowedPi(gts: DataFrame, binSize: Long = 1000L): DataFrame = {
    val d = dosage(col("gt"))
    val perVar = gts
      .select(col("varId"), col("chrom"), col("pos"), d.as("_d"))
      .groupBy("varId", "chrom", "pos")
      .agg(count(col("_d")).as("_n"), sum(col("_d")).as("_ca"))
      .where(col("_n") > 0)
      .withColumn("_ct", lit(2L) * col("_n"))
      .where(col("_ct") > 1)
      .withColumn("_pi",
        (col("_ct") - col("_ca")) * col("_ca")
          / (col("_ct") * (col("_ct") - 1) / lit(2.0)))
    perVar
      .withColumn("_w", floor(col("pos") / binSize))
      .groupBy(col("chrom"), col("_w"))
      .agg(count(lit(1)).as("n_variants"),
        round(aggregate(
          array_sort(collect_list(struct(col("pos"), col("varId"),
            col("_pi")))),
          lit(0.0), (acc, e) => acc + e.getField("_pi")), 5).as("pi"))
      .select(col("chrom"), (col("_w") * binSize).as("win_start"),
        (col("_w") * binSize + binSize - 1).as("win_end"),
        col("n_variants"), col("pi"))
  }

  /** vcftools `--TajimaD`-style windowed Tajima's D: the
    * sweep/balancing-selection screen comparing two θ estimators —
    * pairwise diversity π (as in [[windowedPi]]) against Watterson's
    * S/a₁ — normalized by Tajima 1989's variance constants (a₁ a₂ b₁
    * b₂ c₁ c₂ e₁ e₂, all closed-form functions of the sequence count
    * `nSequences`). Negative D = excess rare variants (sweep/expansion),
    * positive = excess intermediate frequencies (balancing).
    *
    * `nSequences` is the cohort's nominal allele count (2×samples) —
    * vcftools recomputes per-site n under missingness; the constant-n
    * form is the documented divergence and is exact on complete calls.
    * The harmonic-sum constants fold ascending in both engines, so the
    * oracle's doubles are bit-equal; D rounds to 4. Null D where S = 0
    * (the statistic is undefined on invariant windows — vcftools
    * prints nan). Same one-groupBy + one-window-aggregation plan as
    * [[windowedPi]].
    */
  def tajimaD(gts: DataFrame, nSequences: Int,
              binSize: Long = 1000L): DataFrame = {
    require(nSequences >= 2, "tajimaD needs >= 2 sequences")
    val n = nSequences
    val a1 = (1 until n).foldLeft(0.0)((a, i) => a + 1.0 / i)
    val a2 = (1 until n).foldLeft(0.0)((a, i) => a + 1.0 / (i.toLong * i))
    val b1 = (n + 1) / (3.0 * (n - 1))
    val b2 = 2.0 * (n.toLong * n + n + 3) / (9.0 * n * (n - 1))
    val c1 = b1 - 1.0 / a1
    val c2 = b2 - (n + 2) / (a1 * n) + a2 / (a1 * a1)
    val e1 = c1 / a1
    val e2 = c2 / (a1 * a1 + a2)
    val d = dosage(col("gt"))
    val perVar = gts
      .select(col("varId"), col("chrom"), col("pos"), d.as("_d"))
      .groupBy("varId", "chrom", "pos")
      .agg(count(col("_d")).as("_n"), sum(col("_d")).as("_ca"))
      .where(col("_n") > 0)
      .withColumn("_ct", lit(2L) * col("_n"))
      .where(col("_ct") > 1)
      .withColumn("_pi",
        (col("_ct") - col("_ca")) * col("_ca")
          / (col("_ct") * (col("_ct") - 1) / lit(2.0)))
      .withColumn("_seg",
        when(col("_ca") > 0 && col("_ca") < col("_ct"), 1L)
          .otherwise(0L))
    val win = perVar
      .withColumn("_w", floor(col("pos") / binSize))
      .groupBy(col("chrom"), col("_w"))
      .agg(sum(col("_seg")).as("s_sites"),
        aggregate(
          array_sort(collect_list(struct(col("pos"), col("varId"),
            col("_pi")))),
          lit(0.0), (acc, e) => acc + e.getField("_pi")).as("_pisum"))
    val sC = col("s_sites")
    win
      .withColumn("tajima_d",
        when(sC > 0, round(
          (col("_pisum") - sC / lit(a1))
            / sqrt(lit(e1) * sC + lit(e2) * sC * (sC - 1)), 4)))
      .select(col("chrom"), (col("_w") * binSize).as("win_start"),
        (col("_w") * binSize + binSize - 1).as("win_end"),
        col("s_sites"), round(col("_pisum"), 5).as("pi"),
        col("tajima_d"))
  }

  /** plink-mendel-style Mendelian-consistency check for trios on diploid
    * biallelic genotypes. `gts` is the long genotype matrix — one row per
    * (varId, chrom, pos, sample, gt); `trios` is (child, mother, father),
    * tiny, broadcast. Each parent contributes exactly one allele, so the
    * child's feasible ALT-dosage interval given parent dosages is
    * [ (momD==2)+(dadD==2), (momD>=1)+(dadD>=1) ]; a call outside it is a
    * Mendelian violation. Rows with any missing genotype in the trio are
    * dropped (plink skips incomplete trios). X/Y hemizygous logic is the
    * caller's to apply upstream (filter or re-code), as in the
    * Haplotypes PAR handling — this operator is autosomal-diploid.
    */
  /** plink `--hardy`-style Hardy-Weinberg equilibrium test per variant
    * over diploid biallelic genotypes. `gts` is the long genotype matrix
    * (one row per (varId, chrom, pos, sample, gt)); missing genotypes are
    * dropped from the denominator (plink semantics), X/Y hemizygous
    * recoding is the caller's (filter upstream, as in mendelViolations).
    *
    * One groupBy(varId) of conditional sums — map-side partials ship
    * three longs per variant per task, so a biobank-scale (100k-sample)
    * matrix reduces before the exchange; all downstream arithmetic
    * (allele freq, expected het, the 3-class chi-square) is per-row
    * column math on the tiny aggregated frame. chi2 is null for
    * monomorphic variants (an expected class count is 0); doubles are
    * rounded to 5 so an independent engine reproduces the hash.
    */
  def hardyWeinberg(gts: DataFrame): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val d = col("_d")
    val counts = gts
      .select(col("varId"), col("chrom"), col("pos"),
        dosage(col("gt")).as("_d"))
      .where(d.isNotNull)
      .groupBy(col("varId"), col("chrom"), col("pos"))
      .agg(count(lit(1)).as("n_called"),
        cnt(d === 0).as("n_hom_ref"),
        cnt(d === 1).as("n_het"),
        cnt(d === 2).as("n_hom_alt"))
    val n = col("n_called").cast("double")
    val p = (col("n_hom_alt") * 2 + col("n_het")) / (n * 2)
    val q = lit(1.0) - p
    def dev(obs: Column, exp: Column) = (obs - exp) * (obs - exp) / exp
    counts
      .withColumn("maf", round(least(p, q), 5))
      .withColumn("obs_het", round(col("n_het") / n, 5))
      .withColumn("exp_het", round(lit(2.0) * p * q, 5))
      .withColumn("chi2",
        when(col("n_hom_alt") * 2 + col("n_het") > 0 &&
          col("n_hom_ref") * 2 + col("n_het") > 0,
          round(dev(col("n_hom_ref"), n * q * q) +
            dev(col("n_het"), n * lit(2.0) * p * q) +
            dev(col("n_hom_alt"), n * p * p), 5)))
  }

  /** plink `--homozyg`-style runs of homozygosity: per (sample, chrom),
    * maximal runs of >= minVariants CONSECUTIVE homozygous calls
    * (ALT dosage 0 or 2; a het call breaks the run, a missing call is
    * invisible — dropped before run detection, plink's default).
    *
    * Gaps-and-islands on ONE (sample, chrom) exchange: both row_number
    * windows and the final run aggregation share the partition key, so
    * the second window and the groupBy reuse the first window's
    * hash partitioning (sort-only stages — no further shuffles). Samples
    * x chromosomes parallelizes across executors; no per-sample loop.
    */
  def rohSegments(gts: DataFrame, minVariants: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // varId tiebreak: two variants at the same pos (multi-allelic split
    // rows) would otherwise order arbitrarily and make run membership
    // nondeterministic across engines/runs
    val w = Window.partitionBy(col("sample"), col("chrom"))
      .orderBy(col("pos"), col("varId"))
    val called = gts
      .select(col("sample"), col("chrom"), col("pos"), col("varId"),
        dosage(col("gt")).as("_d"))
      .where(col("_d").isNotNull)
      .withColumn("_rn", row_number().over(w))
    called.where(col("_d") === 0 || col("_d") === 2)
      .withColumn("_grp", col("_rn") - row_number().over(w))
      .groupBy(col("sample"), col("chrom"), col("_grp"))
      .agg(min(col("pos")).as("run_start"), max(col("pos")).as("run_end"),
        count(lit(1)).as("n_hom"))
      .where(col("n_hom") >= minVariants)
      .drop("_grp")
  }

  /** F_ROH genomic inbreeding coefficient per sample: the fraction of
    * the surveyed span covered by runs of homozygosity — the
    * consanguinity/bottleneck statistic ROH screens exist to feed
    * (plink --homozyg's summary column). Rides [[rohSegments]]
    * unchanged; the surveyed span derives from the data itself
    * (Σ per-chrom max(pos)−min(pos)+1 — the array's footprint, the
    * honest denominator when no assembly FAI is supplied) and reduces
    * to ONE broadcast row; samples with no qualifying run report 0.
    */
  def frohCoefficients(gts: DataFrame,
                       minVariants: Int = 3): DataFrame = {
    val segs = rohSegments(gts, minVariants)
      .withColumn("_len", col("run_end") - col("run_start") + 1)
      .groupBy("sample")
      .agg(count(lit(1)).as("n_segments"), sum(col("_len")).as("roh_bp"))
    val span = gts.groupBy("chrom")
      .agg((max(col("pos")) - min(col("pos")) + 1).as("_l"))
      .agg(sum(col("_l")).as("_span"))
    gts.select("sample").distinct()
      .join(segs, Seq("sample"), "left")
      .crossJoin(broadcast(span))
      .select(col("sample"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("roh_bp"), lit(0L)).as("roh_bp"),
        round(coalesce(col("roh_bp"), lit(0L)) / col("_span"), 5)
          .as("froh"))
  }

  /** plink `--missing`-style per-sample call-rate QC: how many genotype
    * calls each sample is missing — the first thing a cohort pipeline
    * checks (a low-call-rate sample is a failed assay, not biology).
    * ONE conditional-sum groupBy(sample); two longs per sample per task.
    */
  def sampleMissingness(gts: DataFrame): DataFrame = {
    val d = dosage(col("gt"))
    gts.select(col("sample"), d.as("_d"))
      .groupBy(col("sample"))
      .agg(count(lit(1)).as("n_sites"),
        sum(when(col("_d").isNull, 1L).otherwise(0L)).as("n_missing"))
      .withColumn("call_rate",
        round((col("n_sites") - col("n_missing")).cast("double") /
          col("n_sites"), 5))
  }

  /** plink `--check-sex`-style inference from X-chromosome
    * heterozygosity: a genetic male is hemizygous on non-PAR X, so his
    * called diploid-coded genotypes there are (almost) never het; a
    * female's are het at roughly the population het rate. Per sample:
    * called/het counts on the provided (already PAR-filtered) X rows,
    * het rate, inferred sex by `maxMaleHetRate`, and the mismatch flag
    * against the declared sex. ONE conditional-sum groupBy(sample).
    */
  def sexCheck(gtsX: DataFrame, declared: DataFrame,
               maxMaleHetRate: Double = 0.2): DataFrame = {
    val d = dosage(col("gt"))
    gtsX.select(col("sample"), d.as("_d"))
      .where(col("_d").isNotNull)
      .groupBy(col("sample"))
      .agg(count(lit(1)).as("n_called"),
        sum(when(col("_d") === 1, 1L).otherwise(0L)).as("n_het"))
      .withColumn("het_rate",
        round(col("n_het").cast("double") / col("n_called"), 5))
      .withColumn("inferred_sex",
        when(col("het_rate") <= maxMaleHetRate, "male")
          .otherwise("female"))
      .join(declared.select(col("sample"),
        col("sex").as("declared_sex")), Seq("sample"), "left")
      .withColumn("mismatch",
        col("declared_sex").isNotNull &&
          col("declared_sex") =!= col("inferred_sex"))
  }

  /** plink `--r2`-style linkage disequilibrium: squared Pearson
    * correlation of ALT dosages for every variant pair on the same
    * chromosome within `maxDist` bases (pos2 strictly greater — each
    * pair reported once; same-pos multi-allelic rows never pair).
    *
    * The pair space is bounded the genomic way, not the all-pairs way:
    * the window predicate becomes g2's binned equi-join keyed
    * (chrom, sample, bin), so candidates per sample are
    * O(variants x window density), never variants². Per-pair sums are
    * EXACT integer partials (map-side combined); the correlation
    * arithmetic runs on the tiny aggregated frame, with products cast
    * to double BEFORE squaring so a biobank-scale n cannot overflow a
    * long. r2 is null when either variant is monomorphic among the
    * pair's shared called samples; rounded to 5 for the oracle.
    */
  def ldPairs(gts: DataFrame, maxDist: Long,
              binSize: Long = 10000L): DataFrame = {
    require(maxDist >= 1, "ldPairs: maxDist must be >= 1")
    val calls = gts.select(col("varId"), col("chrom"), col("pos"),
      col("sample"), dosage(col("gt")).as("_d"))
      .where(col("_d").isNotNull)
    val leftIv = calls.select(col("chrom"), col("sample"),
      col("varId").as("varId1"), col("pos").as("pos1"),
      col("_d").as("_d1"),
      (col("pos") + 1).as("start"), (col("pos") + maxDist).as("end"))
    val rightPts = calls.select(col("chrom"), col("sample"),
      col("varId").as("varId2"), col("pos"), col("_d").as("_d2"))
    val pairs = IntervalJoin.pointsInIntervals(rightPts, leftIv,
      Seq("chrom", "sample"), binSize)
    val agg = pairs
      .groupBy(col("chrom"), col("varId1"), col("pos1"),
        col("varId2"), col("pos").as("pos2"))
      .agg(count(lit(1)).as("n"),
        sum(col("_d1")).as("_sx"), sum(col("_d2")).as("_sy"),
        sum(col("_d1") * col("_d1")).as("_sxx"),
        sum(col("_d2") * col("_d2")).as("_syy"),
        sum(col("_d1") * col("_d2")).as("_sxy"))
    val num = (col("n") * col("_sxy") - col("_sx") * col("_sy"))
      .cast("double")
    val vx = (col("n") * col("_sxx") - col("_sx") * col("_sx"))
    val vy = (col("n") * col("_syy") - col("_sy") * col("_sy"))
    agg.withColumn("r2",
      when(vx > 0 && vy > 0,
        round(num * num / (vx.cast("double") * vy.cast("double")), 5)))
      .select("chrom", "varId1", "pos1", "varId2", "pos2", "n", "r2")
  }

  /** Hudson-estimator Fst per variant between two sample groups (the
    * population-differentiation scan): with per-group ALT frequency p_i
    * over n_i called alleles,
    * num = (p1-p2)² - p1(1-p1)/(n1-1) - p2(1-p2)/(n2-1),
    * den = p1(1-p2) + p2(1-p1), fst = num/den (null when either group
    * has < 2 called alleles or den = 0). `gts` carries a `pop` label
    * column; rows outside the two groups are ignored. ONE groupBy of
    * conditional sums — four longs per variant cross the exchange.
    */
  def fstHudson(gts: DataFrame, popA: String, popB: String): DataFrame = {
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val d = dosage(col("gt"))
    val counts = gts
      .select(col("varId"), col("chrom"), col("pos"), col("pop"),
        d.as("_d"))
      .where(col("_d").isNotNull && col("pop").isin(popA, popB))
      .groupBy(col("varId"), col("chrom"), col("pos"))
      .agg(
        sum(when(col("pop") === popA, col("_d")).otherwise(0L))
          .as("alt_a"),
        (cnt(col("pop") === popA) * 2).as("n_a"),
        sum(when(col("pop") === popB, col("_d")).otherwise(0L))
          .as("alt_b"),
        (cnt(col("pop") === popB) * 2).as("n_b"))
    val p1 = col("alt_a").cast("double") / col("n_a")
    val p2 = col("alt_b").cast("double") / col("n_b")
    val num = (p1 - p2) * (p1 - p2) -
      p1 * (lit(1.0) - p1) / (col("n_a") - 1) -
      p2 * (lit(1.0) - p2) / (col("n_b") - 1)
    val den = p1 * (lit(1.0) - p2) + p2 * (lit(1.0) - p1)
    counts
      .withColumn("fst",
        when(col("n_a") >= 2 && col("n_b") >= 2 && den =!= 0.0,
          round(num / den, 5)))
  }

  /** bcftools gtcheck-style per-sample genotype concordance between two
    * call sets. Both inputs are long genotype matrices keyed
    * (varId, sample); missing genotypes are treated as ABSENT calls
    * (dropped before the join, so they land in the other side's
    * "_only" counters rather than as discordance). ONE full-outer join
    * on (varId, sample) — both sides shuffle once on the same key —
    * then one per-sample aggregation of conditional sums.
    */
  def genotypeConcordance(left: DataFrame, right: DataFrame): DataFrame = {
    def calls(df: DataFrame, side: String) =
      df.select(col("varId"), col("sample"),
        dosage(col("gt")).as(s"_d$side"))
        .where(col(s"_d$side").isNotNull)
    def cnt(c: Column) = sum(when(c, 1L).otherwise(0L))
    val l = col("_dl")
    val r = col("_dr")
    calls(left, "l").join(calls(right, "r"), Seq("varId", "sample"),
        "full_outer")
      .groupBy(col("sample"))
      .agg(cnt(l.isNotNull && r.isNull).as("n_left_only"),
        cnt(l.isNull && r.isNotNull).as("n_right_only"),
        cnt(l === r).as("n_concordant"),
        cnt(l.isNotNull && r.isNotNull && l =!= r).as("n_discordant"))
      .withColumn("concordance",
        when(col("n_concordant") + col("n_discordant") > 0,
          round(col("n_concordant").cast("double") /
            (col("n_concordant") + col("n_discordant")), 5)))
  }

  def mendelViolations(gts: DataFrame, trios: DataFrame): DataFrame = {
    val d = gts.select(col("varId"), col("chrom"), col("pos"),
      col("sample"), dosage(col("gt")).as("d"))
      .where(col("d").isNotNull)
    val childG = d.join(broadcast(trios), col("sample") === col("child"))
      .select(col("varId"), col("chrom"), col("pos"), col("child"),
        col("mother"), col("father"), col("d").as("child_dose"))
    val momG = d.select(col("varId"), col("sample").as("mother"),
      col("d").as("mother_dose"))
    val dadG = d.select(col("varId"), col("sample").as("father"),
      col("d").as("father_dose"))
    childG
      .join(momG, Seq("varId", "mother"))
      .join(dadG, Seq("varId", "father"))
      .select(col("varId"), col("chrom"), col("pos"), col("child"),
        col("child_dose"), col("mother_dose"), col("father_dose"),
        (col("child_dose") <
          (when(col("mother_dose") === 2, 1).otherwise(0) +
            when(col("father_dose") === 2, 1).otherwise(0)) ||
          col("child_dose") >
            (when(col("mother_dose") >= 1, 1).otherwise(0) +
              when(col("father_dose") >= 1, 1).otherwise(0)))
          .as("violation"))
  }

  /** Rare-variant burden per (transcript, sample) — the collapsing test
    * prep (SKAT/CMC burden): for each gene region, each carrier's total
    * ALT dosage over the qualifying (exonic, AF-capped — the caller
    * filters) variants. Inputs: `exonVariants` (varId, transcript_id)
    * from the g2 binned interval join, `gts` long genotypes. Output has
    * CARRIERS only (burden ≥ 1): at biobank scale the zero rows are
    * samples × transcripts and carry no information — the association
    * test reconstructs zeros from the cohort list. Plan: dosage filter
    * map-side, one varId-keyed join (the variant side is exome-scale,
    * broadcastable after the AF cap), ONE (transcript, sample) groupBy
    * of integer partials.
    */
  def burdenScores(exonVariants: DataFrame, gts: DataFrame): DataFrame = {
    val d = gts.select(col("varId"), col("sample"),
      dosage(col("gt")).as("_d"))
      .where(col("_d") > 0)
    exonVariants.join(d, "varId")
      .groupBy(col("transcript_id"), col("sample"))
      .agg(count(lit(1)).as("n_rare_vars"), sum(col("_d")).as("burden"))
  }

  /** Phase-aware compound-heterozygote detection per (transcript,
    * sample) — the clinical recessive screen phased genotypes exist
    * for: a gene is compound-het when one variant's ALT sits on copy 1
    * and a DIFFERENT variant's ALT on copy 2 (in trans — both gene
    * copies damaged), which unphased data can only guess at. A het
    * variant contributes to exactly one side, so the flag is simply
    * "both sides non-empty"; hom-ALT variants hit both copies via ONE
    * allele pair and are a different (homozygous) mechanism, so they
    * count toward neither side (the standard comp-het definition).
    * Inputs/plan exactly [[burdenScores]]: (varId, transcript_id) exon
    * hits from the binned interval join, long PHASED genotypes, one
    * varId join + ONE (transcript, sample) groupBy of conditional
    * sums. Carriers only (≥ 1 phased het in the gene); missing and
    * unphased ('/') calls are excluded — phase is the point.
    */
  def compoundHet(exonVariants: DataFrame, gts: DataFrame): DataFrame = {
    val al = split(col("gt"), "\\|")
    // try_element_at: Catalyst can evaluate the projection before the
    // size guard filters unphased rows (the sources.Casts ANSI lesson),
    // so a strict element_at(·, 2) would throw on "a/b" calls
    val a1 = try_element_at(al, lit(1))
    val a2 = try_element_at(al, lit(2))
    val d = gts.select(col("varId"), col("sample"),
      (a1 === "1" && a2.isNotNull && a2 =!= "1").as("_c1"),
      (a2 === "1" && a1.isNotNull && a1 =!= "1").as("_c2"))
      .where(size(al) === 2 && !array_contains(al, ".") &&
        (col("_c1") || col("_c2")))
    exonVariants.join(d, "varId")
      .groupBy(col("transcript_id"), col("sample"))
      .agg(sum(when(col("_c1"), 1L).otherwise(0L)).as("n_hap1_vars"),
        sum(when(col("_c2"), 1L).otherwise(0L)).as("n_hap2_vars"))
      .withColumn("compound_het",
        col("n_hap1_vars") >= 1 && col("n_hap2_vars") >= 1)
  }

  /** plink2 `--king-cutoff`-style relatedness pruning: drop samples so
    * no remaining pair's [[kingKinship]] φ̂ reaches `cutoff` (cohort QC
    * demands near-independent samples for association/PCA; 0.0884 is
    * plink2's 3rd-degree default). Deterministic keep-earliest greedy —
    * the g37 LD-prune contract applied to the sample graph: pairs walk
    * in (sample_a, sample_b) order and a pair with both members still
    * standing drops its LATER member. The above-cutoff pair list is
    * metadata-scale (it is the output a cohort acts on — a cohort where
    * it isn't fits no downstream test either), so it collapses to one
    * sorted array row and the walk is ONE sequential fold — no driver
    * loop, no per-round shuffle; the S²·V pair-scan cost itself is
    * [[ibsPairs]]'s documented story. Output: every sample with its
    * pruned flag.
    */
  def kingPrune(gts: DataFrame, cutoff: Double): DataFrame = {
    val pairs = kingKinship(gts)
      .where(col("kinship").isNotNull && col("kinship") >= cutoff)
      .agg(sort_array(collect_list(
        struct(col("sample_a"), col("sample_b")))).as("_ps"))
    val dropped = aggregate(col("_ps"),
      array().cast("array<string>"),
      (acc, p) => when(
        array_contains(acc, p.getField("sample_a")) ||
          array_contains(acc, p.getField("sample_b")), acc)
        .otherwise(concat(acc, array(p.getField("sample_b")))))
    gts.select(col("sample")).distinct()
      .crossJoin(broadcast(pairs.select(dropped.as("_d"))))
      .select(col("sample"),
        array_contains(col("_d"), col("sample")).as("pruned"))
  }

  /** Per-sample singleton counts (bcftools stats PSC nSingletons): how
    * many variants each sample carries ALONE (allele count 1 across the
    * called cohort) — the per-sample rare-variant-load QC that flags
    * contaminated or population-outlier samples (excess singletons) and
    * duplicates (deficit). Plan: ONE variant-keyed conditional-sum
    * groupBy for allele counts, a varId join back to the dosage rows
    * (the singleton side is rare — AQE broadcasts it), one sample
    * groupBy; sample-complete output via a left join on the distinct
    * sample list (zero-singleton samples report 0).
    */
  def sampleSingletons(gts: DataFrame): DataFrame = {
    val d = gts.select(col("varId"), col("sample"),
      dosage(col("gt")).as("_d"))
      .where(col("_d").isNotNull)
    val singles = d.groupBy(col("varId"))
      .agg(sum(col("_d")).as("_ac"))
      .where(col("_ac") === 1)
      .select(col("varId"))
    val counts = d.where(col("_d") === 1)
      .join(singles, "varId")
      .groupBy(col("sample"))
      .agg(count(lit(1)).as("_n"))
    gts.select(col("sample")).distinct()
      .join(counts, Seq("sample"), "left")
      .select(col("sample"),
        coalesce(col("_n"), lit(0L)).as("n_singletons"))
  }

  /** Site frequency spectrum (vcftools `--freq` / dadi-style SFS): the
    * per-variant minor-allele count histogram population genetics reads
    * demography and selection off. Per variant: ALT allele count over
    * CALLED genotypes (missing calls shrink that variant's allele number
    * rather than biasing its frequency), folded to the minor allele.
    * Variants are binned by (allele_number, minor_allele_count) — with
    * missing data the allele number varies per site, and folding 3/8
    * into the same bin as 3/10 would compare incomparable frequencies.
    * Plan: one variant-keyed groupBy of conditional sums (two longs per
    * variant per map task — the [[hardyWeinberg]] exchange), then a tiny
    * second aggregation over one row per variant. At biobank scale the
    * spectrum frame is ≤ 2·samples rows — metadata-sized output from a
    * single pass however many variants the cohort holds.
    */
  def siteFrequencySpectrum(gts: DataFrame): DataFrame = {
    val d = gts.select(col("varId"), dosage(col("gt")).as("d"))
      .where(col("d").isNotNull)
    d.groupBy(col("varId"))
      .agg(count(lit(1)).as("_nc"), sum(col("d")).as("_ac"))
      .select((col("_nc") * 2).as("an"),
        least(col("_ac"), col("_nc") * 2 - col("_ac")).as("mac"))
      .groupBy(col("an"), col("mac"))
      .agg(count(lit(1)).as("n_variants"))
  }

  /** Transmission disequilibrium test (plink `--tdt`): per variant, ALT
    * vs REF transmissions from HETEROZYGOUS parents to their children —
    * the family-based association test that is immune to population
    * stratification (each het parent is its own internal control).
    * Transmission counts are fully determined by trio dosages when the
    * trio is Mendel-consistent: hom parents' transmissions are forced,
    * so ALT-from-het = child_dose − (#hom-ALT parents), and a both-het
    * child-het trio contributes one ALT and one REF. Mendel-violating
    * trios (see [[mendelViolations]]) and trios with any missing call
    * are excluded per variant, plink's behavior. χ² = (b−c)²/(b+c) with
    * 1 df, null when no informative (het-parent) transmissions exist.
    * Plan: [[mendelViolations]]'s exact join shape — trio table
    * broadcast, genotype matrix shuffled once per parent join — then ONE
    * variant-keyed groupBy of conditional sums (three longs per variant
    * per map task); the χ² arithmetic runs on the aggregated frame.
    * Autosomal-diploid contract: filter X upstream (as g11 does).
    */
  def tdt(gts: DataFrame, trios: DataFrame): DataFrame = {
    val d = gts.select(col("varId"), col("chrom"), col("pos"),
      col("sample"), dosage(col("gt")).as("d"))
      .where(col("d").isNotNull)
    val childG = d.join(broadcast(trios), col("sample") === col("child"))
      .select(col("varId"), col("chrom"), col("pos"), col("child"),
        col("mother"), col("father"), col("d").as("dc"))
    val momG = d.select(col("varId"), col("sample").as("mother"),
      col("d").as("dm"))
    val dadG = d.select(col("varId"), col("sample").as("father"),
      col("d").as("df"))
    val joined = childG
      .join(momG, Seq("varId", "mother"))
      .join(dadG, Seq("varId", "father"))
    val homAlt = when(col("dm") === 2, 1).otherwise(0) +
      when(col("df") === 2, 1).otherwise(0)
    val nHet = when(col("dm") === 1, 1).otherwise(0) +
      when(col("df") === 1, 1).otherwise(0)
    val altFromHet = col("dc") - homAlt
    val consistent = altFromHet >= 0 && altFromHet <= nHet
    val b = col("t_alt"); val c = col("t_ref")
    joined
      .where(consistent)
      .select(col("varId"), col("chrom"), col("pos"),
        nHet.as("_nh"), altFromHet.as("_b"))
      .groupBy(col("varId"), col("chrom"), col("pos"))
      .agg(sum(when(col("_nh") > 0, 1L).otherwise(0L))
          .as("n_informative_trios"),
        sum(col("_b").cast("long")).as("t_alt"),
        sum((col("_nh") - col("_b")).cast("long")).as("t_ref"))
      .withColumn("chi2",
        when(b + c > 0,
          round((b - c).cast("double") * (b - c) / (b + c), 5)))
  }
}
