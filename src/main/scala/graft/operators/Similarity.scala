package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.vectors

/** Similarity search over embedding columns.
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the (small)
  * query set against the corpus — one scan, no shuffle of the corpus, the
  * only shuffle is the final per-query top-k (tiny). The LSH-bucketed
  * variant is the 100 TB path: corpus and queries key by sign-bit buckets so
  * each query only scans its bucket (+ optional multi-probe), trading recall
  * for a ~2^bits scan reduction.
  */
object Similarity {

  /** Feature-hashing document embeddings — the model-free text→vector
    * bridge into this family: each document's words hash into `dim`
    * buckets (the fused graft_md5_buckets kernel, the t15/t35
    * contract), term frequencies L2-normalize, and the result is a
    * sparse LONG-FORM embedding (doc, bucket, tf, value) any consumer
    * here densifies or joins on — the classic cheap baseline when no
    * trained encoder exists (and the deterministic stand-in for one).
    * Exactness: tf and the squared norm are INTEGERS, so value =
    * round(tf/√Σtf², 5) is a single correctly-rounded double op —
    * engine-exact without sorted folds. Plan: one (doc, bucket) count
    * aggregation + one doc-keyed norm aggregation joined back — two
    * narrow exchanges, no text crosses either.
    */
  def hashedEmbedding(docs: DataFrame, idCol: String, textCol: String,
                      dim: Int): DataFrame = {
    require(dim > 0, "hashedEmbedding dim must be > 0")
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val tf = docs
      .select(col(idCol), explode(call_function("graft_md5_buckets",
        graft.functions.text.words(col(textCol)), lit(dim)))
        .as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("tf"))
    val norms = tf.groupBy(col(idCol))
      .agg(sum(col("tf") * col("tf")).as("_n2"))
    tf.join(norms, idCol)
      .select(col(idCol), col("bucket"), col("tf"),
        round(col("tf") / sqrt(col("_n2")), 5).as("value"))
  }

  /** Exact top-k nearest neighbors by cosine. Queries should be small
    * (broadcast); corpus is scanned once. Ties break on corpus id.
    */
  def knnCosine(queries: DataFrame, corpus: DataFrame, k: Int,
                qId: String = "qid", qVec: String = "qvec",
                cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    // Score map-side (broadcast queries, one corpus scan), then drop the
    // vectors so only narrow (qid, cid, cosine) rows ever shuffle. The
    // native graft_cosine keeps the per-pair dot product inside codegen.
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine", col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5)
          .as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Per-query top-k via the native bounded_top_k aggregate
    * (graft.plans.BoundedTopK): a fixed-size heap participating in
    * PARTIAL aggregation, so each map task ships at most k rows per query
    * into the shuffle — the scored corpus never converges on a reducer,
    * unlike a window row_number cut. Ordering: cosine desc, id asc.
    */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int,
                                      qId: String, cId: String,
                                      scoreCol: String = "cosine")
    : DataFrame = {
    graft.plans.BoundedTopK.register(scored.sparkSession)
    scored
      .groupBy(col(qId))
      .agg(expr(s"${graft.plans.BoundedTopK.name}" +
        s"(struct($scoreCol, $cId), $k)").as("_tk"))
      .select(col(qId), posexplode(col("_tk")).as(Seq("_r", "_e")))
      .select(col(qId), col("_e.id").as(cId),
        col("_e.score").as(scoreCol),
        (col("_r") + 1).cast("long").as("rank"))
  }

  /** Exact max-inner-product search (MIPS) top-k: retrieval scoring where
    * magnitude matters (recommender dot products, un-normalized
    * embeddings), so cosine's norm division is wrong. Same plan economics
    * as [[knnCosine]]: broadcast queries, one corpus scan, narrow
    * (qid, cid, dot) rows into the bounded_top_k partial aggregate. Ties
    * break on corpus id.
    *
    * Scale path beyond brute force: [[mipsAugment]] reduces MIPS to
    * cosine ANN (order-preserving), after which every bucketed variant
    * here (LSH / IVF / PQ) applies unchanged.
    */
  def knnDot(queries: DataFrame, corpus: DataFrame, k: Int,
             qId: String = "qid", qVec: String = "qvec",
             cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val scored = corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(call_function("graft_dot", col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5)
          .as("dot"))
    topKPerQuery(scored, k, qId, cId, scoreCol = "dot")
  }

  /** Norm augmentation (Neyshabur & Srebro 2015): append
    * sqrt(maxNorm² − ‖v‖²) to every corpus vector and 0.0 to every query
    * vector; cosine over the augmented space then ranks EXACTLY like the
    * inner product over the original space (cos(q', v') =
    * q·v / (‖q‖·maxNorm), a per-query-constant scaling) — so any cosine
    * ANN index (LSH / IVF / PQ) answers MIPS with no new index type.
    * One tiny max-norm aggregate broadcasts; the augmentation itself is
    * a per-row expression on the scan. SimilaritySpec asserts rank
    * equality against [[knnDot]].
    */
  def mipsAugment(corpus: DataFrame, vecCol: String): DataFrame = {
    val norm2 = aggregate(col(vecCol).cast("array<double>"), lit(0.0),
      (acc, x) => acc + x * x)
    val maxN2 = corpus.agg(max(norm2).as("_maxN2"))
    corpus.crossJoin(broadcast(maxN2))
      .withColumn(vecCol,
        concat(col(vecCol).cast("array<double>"),
          array(sqrt(greatest(col("_maxN2") - norm2, lit(0.0))))))
      .drop("_maxN2")
  }

  /** Query-side counterpart of [[mipsAugment]]: append 0.0. */
  def mipsAugmentQuery(queries: DataFrame, vecCol: String): DataFrame =
    queries.withColumn(vecCol,
      concat(col(vecCol).cast("array<double>"), array(lit(0.0))))

  /** Row-wise nearest-centroid assignment — the streaming-ingest form of
    * the IVF coarse quantizer: the codebook collapses to ONE array row
    * (collect_list aggregate, never a driver collect) broadcast to every
    * task, and each vector folds over it in a per-row expression
    * (array_max over struct(cosine, -centId): highest cosine, ties to
    * the smallest centroid id — identical resolution to the agg-based
    * assignment inside [[knnCosineIvfWith]]).
    *
    * Zero aggregation state and zero shuffles on the vector side
    * (PlanSpec-pinned), so the same call works UNCHANGED on a streaming
    * DataFrame — arriving embeddings pick their IVF list map-side at any
    * rate, the per-batch cost is |batch|·nlist·dim multiply-adds, and a
    * codebook refresh is picked up by the next micro-batch the way e4's
    * stream-static dimension join is. This is how vectors enter a
    * 100 TB ANN index incrementally: assignment is embarrassingly
    * parallel; only list compaction (a batch job) ever reshuffles.
    */
  def coarseAssignRowwise(vectors: DataFrame, codebook: DataFrame,
                          vId: String = "cid", vVec: String = "cvec",
                          keep: Seq[String] = Nil)
    : DataFrame = {
    graft.plans.GraftFunctions.register(vectors.sparkSession)
    val cbArr = codebook.agg(collect_list(struct(
      col("centId").cast("long").as("centId"),
      col("centVec").cast("array<double>").as("centVec"))).as("_cb"))
    val scored = transform(col("_cb"), c => struct(
      round(call_function("graft_cosine",
        col(vVec).cast("array<double>"), c.getField("centVec")), 5)
        .as("cosine"),
      (-c.getField("centId")).as("_negId")))
    vectors.crossJoin(broadcast(cbArr))
      .select(col(vId).as("vec_id") +: keep.map(col) :+
        array_max(scored).as("_best"): _*)
      .select(col("vec_id") +: keep.map(col) :+
        (-col("_best._negId")).as("list_id") :+
        col("_best.cosine").as("cosine"): _*)
  }

  /** IVF (inverted-file) approximate top-k: the corpus is coarsely
    * quantized to its nearest centroid, queries probe their `nprobe`
    * nearest centroid lists, and only those lists are scanned.
    *
    * The codebook is a deterministic sample of the corpus itself (every
    * `centStep`-th id) — the training-free IVF-flat baseline; swap in
    * k-means centroids for tighter lists without touching the plan shape.
    * Both the corpus assignment and the query probe use the native
    * bounded_top_k partial aggregate, so the assignment shuffle carries at
    * most one (id, centroid) row per vector per map task and the scored
    * candidates per query stay ~|corpus| * nprobe / nlist — the 100 TB
    * scan-reduction path where sign-LSH recall decays with dimension.
    */
  def knnCosineIvf(queries: DataFrame, corpus: DataFrame, k: Int,
                   centStep: Long, nprobe: Int,
                   qId: String = "qid", qVec: String = "qvec",
                   cId: String = "cid", cVec: String = "cvec"): DataFrame =
    knnCosineIvfWith(queries, corpus, k,
      sampleCodebook(corpus, centStep, cId, cVec), nprobe,
      qId, qVec, cId, cVec)

  /** Training-free codebook: every `centStep`-th corpus vector. */
  def sampleCodebook(corpus: DataFrame, centStep: Long,
                     cId: String = "cid",
                     cVec: String = "cvec"): DataFrame =
    corpus.where(pmod(col(cId), lit(centStep)) === 0)
      .select(col(cId).as("centId"),
        col(cVec).cast("array<double>").as("centVec"))

  /** Spherical k-means codebook: `iters` Lloyd rounds over the corpus,
    * entirely as DataFrame aggregations — assignment is the same
    * broadcast-centroids + bounded_top_k(1) plan the IVF query path uses,
    * and the update step is one per-(centroid, dimension) avg shuffle
    * (posexplode keeps rows narrow: corpus x dim (centId, dim, v)
    * triples, partially aggregated map-side). Cosine assignment is
    * scale-invariant, so centroid means skip renormalization. Empty
    * clusters keep their previous centroid. Each round localCheckpoints
    * the nlist-row centroid table, truncating lineage without any
    * driver-side collect; at 100 TB the assignment scan dominates and
    * parallelizes per partition, exactly like the query path. Centroid
    * dims round to 6 decimals so FP summation-order noise cannot flip a
    * downstream assignment (mirrors the SQL oracle).
    *
    * Init = the sampleCodebook vectors reindexed 0..nlist-1 — trained and
    * training-free variants are directly comparable at equal nlist
    * (SimilaritySpec measures recall@k of both against exact kNN).
    */
  def kmeansCodebook(corpus: DataFrame, initStep: Long, iters: Int,
                     cId: String = "cid",
                     cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(call_function("graft_cosine", a.cast("array<double>"),
        b.cast("array<double>")), 5)
    var cents = sampleCodebook(corpus, initStep, cId, cVec)
      .select((col("centId") / initStep).cast("long").as("centId"),
        col("centVec"))
    for (_ <- 1 to iters) {
      val assigned = topKPerQuery(
        corpus.crossJoin(broadcast(cents))
          .select(col(cId), col("centId"),
            cos(col(cVec), col("centVec")).as("cosine")),
        1, cId, "centId")
        .select(col(cId), col("centId"))
      val means = assigned
        .join(corpus.select(col(cId), col(cVec)), Seq(cId))
        .select(col("centId"),
          posexplode(col(cVec).cast("array<double>")).as(Seq("dim", "v")))
        .groupBy("centId", "dim").agg(avg(col("v")).as("m"))
        .groupBy("centId")
        .agg(transform(array_sort(collect_list(struct(col("dim"),
          col("m")))), e => round(e.getField("m"), 6)).as("newVec"))
      val prev = cents
      cents = cents
        .join(means, Seq("centId"), "left")
        .select(col("centId"),
          coalesce(col("newVec"), col("centVec")).as("centVec"))
        .localCheckpoint()
      // free the superseded round's checkpoint RDD (no-op on the
      // uncheckpointed init table in round 1)
      Checkpoints.free(prev)
    }
    cents
  }

  /** Persist a codebook (centId, centVec) as parquet so repeated ANN
    * batches skip retraining: Lloyd rounds scan the whole corpus, while a
    * reloaded codebook costs one small-file read — on a 100 TB corpus the
    * codebook is a few thousand rows regardless of corpus size, and the
    * query plan with a loaded codebook is IDENTICAL to the freshly
    * trained one (broadcast + bounded_top_k), so persistence changes
    * nothing downstream. Doubles survive parquet bit-exactly: a
    * save/load round trip returns bit-identical neighbors (the s5 gate
    * asserts this against the s3b oracle).
    */
  def saveCodebook(codebook: DataFrame, path: String): Unit =
    codebook
      .select(col("centId").cast("long").as("centId"),
        col("centVec").cast("array<double>").as("centVec"))
      .write.mode("overwrite").parquet(path)

  /** Reload a codebook written by [[saveCodebook]]. */
  def loadCodebook(spark: org.apache.spark.sql.SparkSession,
                   path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("centId"), col("centVec").cast("array<double>")
        .as("centVec"))

  /** IVF with an explicit codebook (centId, centVec) — see knnCosineIvf. */
  def knnCosineIvfWith(queries: DataFrame, corpus: DataFrame, k: Int,
                       codebook: DataFrame, nprobe: Int,
                       qId: String = "qid", qVec: String = "qvec",
                       cId: String = "cid",
                       cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(call_function("graft_cosine", a.cast("array<double>"),
        b.cast("array<double>")), 5)
    val cents = broadcast(codebook)
    // coarse assignment: nearest centroid per corpus vector
    val assign = topKPerQuery(
      corpus.crossJoin(cents)
        .select(col(cId), col("centId"),
          cos(col(cVec), col("centVec")).as("cosine")),
      1, cId, "centId")
      .select(col(cId), col("centId"))
    // query probes: nprobe nearest centroid lists
    val probes = topKPerQuery(
      queries.crossJoin(cents)
        .select(col(qId), col("centId"),
          cos(col(qVec), col("centVec")).as("cosine")),
      nprobe, qId, "centId")
      .select(col(qId), col("centId"))
    // scan only the probed lists ((qid, cid) is unique: each cid belongs
    // to exactly one list), then exact top-k on the candidates
    val scored = probes.join(assign, Seq("centId"))
      .join(corpus, Seq(cId))
      .join(broadcast(queries), Seq(qId))
      .select(col(qId), col(cId), cos(col(qVec), col(cVec)).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Radius (range) search: every corpus vector whose cosine with a query
    * meets `threshold` — the "all near neighbors" dual of top-k, used for
    * near-duplicate audits and retrieval recall sweeps where the cutoff is
    * a similarity bar, not a count.
    *
    * Scale rationale: with broadcast queries there is NO per-query
    * reduction, so the exact variant is SHUFFLE-FREE — score and filter
    * happen map-side in one corpus scan and matching rows stream straight
    * to the sink. That makes exact range search cheaper than exact top-k
    * at any corpus size (top-k must converge per-query state); the only
    * risk at 100 TB is a too-low threshold exploding the OUTPUT, which is
    * a property of the answer, not the plan.
    */
  def rangeCosine(queries: DataFrame, corpus: DataFrame, threshold: Double,
                  qId: String = "qid", qVec: String = "qvec",
                  cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    corpus.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine", col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5)
          .as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** IVF-pruned range search: corpus vectors coarse-assign to their
    * nearest codebook centroid (bounded_top_k(1) partial aggregate, same
    * as the kNN path), queries probe their `nprobe` nearest lists, and
    * only those lists are scored against the threshold. Same
    * scan-reduction economics as [[knnCosineIvfWith]] — candidates per
    * query stay ~|corpus| * nprobe / nlist — with the shuffle-free
    * filter tail of [[rangeCosine]] instead of a top-k reduction.
    * Recall-only approximation: a true neighbor in an unprobed list is
    * missed, never a false positive (the final cosine is exact).
    */
  def rangeCosineIvfWith(queries: DataFrame, corpus: DataFrame,
                         threshold: Double, codebook: DataFrame, nprobe: Int,
                         qId: String = "qid", qVec: String = "qvec",
                         cId: String = "cid",
                         cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(call_function("graft_cosine", a.cast("array<double>"),
        b.cast("array<double>")), 5)
    val cents = broadcast(codebook)
    val assign = topKPerQuery(
      corpus.crossJoin(cents)
        .select(col(cId), col("centId"),
          cos(col(cVec), col("centVec")).as("cosine")),
      1, cId, "centId")
      .select(col(cId), col("centId"))
    val probes = topKPerQuery(
      queries.crossJoin(cents)
        .select(col(qId), col("centId"),
          cos(col(qVec), col("centVec")).as("cosine")),
      nprobe, qId, "centId")
      .select(col(qId), col("centId"))
    probes.join(assign, Seq("centId"))
      .join(corpus, Seq(cId))
      .join(broadcast(queries), Seq(qId))
      .select(col(qId), col(cId), cos(col(qVec), col(cVec)).as("cosine"))
      .where(col("cosine") >= threshold)
  }

  /** Product-quantization (PQ) approximate top-k: each corpus vector is
    * compressed to `subspaces` small codes — per subspace, the id of its
    * nearest codebook sub-centroid by L2 — and queries score against the
    * RECONSTRUCTED vectors (sub-centroids concatenated back), which is
    * numerically identical to asymmetric-distance (ADC) lookup with exact
    * per-subspace sums.
    *
    * Scale rationale: after encoding, the corpus state that must live in
    * the search path is `subspaces` longs per vector instead of `dim`
    * floats (here 4 codes vs 64 floats = 32x), which is what makes
    * billion-vector indexes fit executor memory; encoding itself is one
    * broadcast-codebook scan + a bounded_top_k(1) partial aggregate per
    * (vector, subspace) — no corpus shuffle carries raw vectors. The
    * codebook is the deterministic every-`centStep`-th sample (swap in
    * kmeansCodebook slices for trained sub-centroids).
    *
    * Determinism contract with the SQL oracle: L2 partials fold
    * left-to-right and round to 6 dp before the argmin (ties -> lower
    * code), reconstruction concatenates in subspace order, final cosine
    * rounds to 5 dp (ties -> lower corpus id).
    */
  def knnCosinePq(queries: DataFrame, corpus: DataFrame, k: Int,
                  dim: Int, subspaces: Int, centStep: Long,
                  qId: String = "qid", qVec: String = "qvec",
                  cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val rec = pqReconstruct(corpus, dim, subspaces, centStep, cId, cVec)
    val scored = rec.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine",
          col(qVec).cast("array<double>"), col("rvec")), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** PQ with a TRAINED codebook: any (centId, centVec) table — typically
    * [[kmeansCodebook]] — sliced per subspace into sub-centroids
    * ([[pqSubCodebook]]). Same encode/reconstruct/score plan as
    * [[knnCosinePq]] (the codebook source never changes the plan shape:
    * both are a broadcast table the corpus scans against), but trained
    * sub-centroids sit where the corpus mass actually is, so the
    * reconstruction error — and therefore the ranking distortion — only
    * drops versus the deterministic sample at equal code budget
    * (SimilaritySpec asserts recall@k trained >= sampled).
    */
  def knnCosinePqWith(queries: DataFrame, corpus: DataFrame, k: Int,
                      dim: Int, subspaces: Int, codebook: DataFrame,
                      qId: String = "qid", qVec: String = "qvec",
                      cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    val rec = pqReconstructWith(corpus,
      pqSubCodebook(codebook, dim, subspaces), cId, cVec, dim, subspaces)
    val scored = rec.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine",
          col(qVec).cast("array<double>"), col("rvec")), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Slice a (centId, centVec) codebook into the per-subspace
    * sub-centroid table (code, sub, scv) [[pqReconstructWith]] consumes —
    * sub-centroid `code` of subspace `sub` is dims
    * [sub*subDim, (sub+1)*subDim) of centroid `centId`.
    */
  def pqSubCodebook(codebook: DataFrame, dim: Int,
                    subspaces: Int): DataFrame = {
    require(dim % subspaces == 0, "dim must divide evenly into subspaces")
    val subDim = dim / subspaces
    codebook
      .select(col("centId").as("code"),
        col("centVec").cast("array<double>").as("_v"))
      .select(col("code"),
        posexplode(transform(sequence(lit(0), lit(subspaces - 1)),
          s => slice(col("_v"), s * subDim + 1, lit(subDim))))
          .as(Seq("sub", "scv")))
  }

  /** PQ encode + reconstruct: (cId, rvec) with rvec the concatenation of
    * each subspace's nearest sub-centroid — the shared compression step
    * behind [[knnCosinePq]] and [[knnCosineIvfPq]]. See knnCosinePq for
    * the determinism contract.
    */
  private[operators] def pqReconstruct(corpus: DataFrame, dim: Int,
                                       subspaces: Int, centStep: Long,
                                       cId: String,
                                       cVec: String): DataFrame = {
    require(dim % subspaces == 0, "dim must divide evenly into subspaces")
    val subDim = dim / subspaces
    val cb = corpus.where(pmod(col(cId), lit(centStep)) === 0)
      .select((col(cId) / centStep).cast("long").as("code"),
        col(cVec).cast("array<double>").as("_v"))
      .select(col("code"),
        posexplode(transform(sequence(lit(0), lit(subspaces - 1)),
          s => slice(col("_v"), s * subDim + 1, lit(subDim))))
          .as(Seq("sub", "scv")))
    pqReconstructWith(corpus, cb, cId, cVec, dim, subspaces)
  }

  /** Shared PQ encode + reconstruct against an explicit sub-centroid
    * table (code, sub, scv) — see [[knnCosinePq]] for the determinism
    * contract; [[pqSubCodebook]] builds the table from a trained
    * codebook.
    */
  private[operators] def pqReconstructWith(corpus: DataFrame,
                                           subCb: DataFrame,
                                           cId: String, cVec: String,
                                           dim: Int,
                                           subspaces: Int): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    graft.plans.BoundedTopK.register(corpus.sparkSession)
    require(dim % subspaces == 0, "dim must divide evenly into subspaces")
    val subDim = dim / subspaces
    val cb = subCb
    val corpusSubs = corpus
      .select(col(cId), col(cVec).cast("array<double>").as("_v"))
      .select(col(cId),
        posexplode(transform(sequence(lit(0), lit(subspaces - 1)),
          s => slice(col("_v"), s * subDim + 1, lit(subDim))))
          .as(Seq("sub", "sv")))
    // encode: argmin_code round(L2(sv, scv), 6), ties -> lower code
    val codes = corpusSubs.join(broadcast(cb), Seq("sub"))
      .select(col(cId), col("sub"), col("code"),
        round(aggregate(zip_with(col("sv"), col("scv"),
          (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x), 6)
          .as("l2"))
      .groupBy(col(cId), col("sub"))
      .agg(expr(s"${graft.plans.BoundedTopK.name}" +
        "(struct(-l2, code), 1)").as("_tk"))
      .select(col(cId), col("sub"), col("_tk")(0).getField("id").as("code"))
    // reconstruct in subspace order
    codes.join(broadcast(cb), Seq("sub", "code"))
      .groupBy(col(cId))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("sub"), col("scv")))),
        e => e.getField("scv"))).as("rvec"))
  }

  /** IVF-PQ: the production ANN composition — IVF coarse pruning bounds
    * HOW MANY candidates each query scores (~|corpus| * nprobe / nlist)
    * while PQ compression bounds WHAT the search path holds per
    * candidate (`subspaces` sub-centroids instead of `dim` floats).
    * Candidates from the probed lists are scored against their PQ
    * reconstructions (exact-ADC contract, see [[knnCosinePq]]); both
    * codebooks are deterministic corpus samples, swappable for trained
    * ones without touching the plan shape.
    */
  def knnCosineIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
                     ivfStep: Long, nprobe: Int,
                     dim: Int, subspaces: Int, pqStep: Long,
                     qId: String = "qid", qVec: String = "qvec",
                     cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    def cos(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      round(call_function("graft_cosine", a.cast("array<double>"),
        b.cast("array<double>")), 5)
    val cents = broadcast(sampleCodebook(corpus, ivfStep, cId, cVec))
    val assign = topKPerQuery(
      corpus.crossJoin(cents)
        .select(col(cId), col("centId"),
          cos(col(cVec), col("centVec")).as("cosine")),
      1, cId, "centId")
      .select(col(cId), col("centId"))
    val probes = topKPerQuery(
      queries.crossJoin(cents)
        .select(col(qId), col("centId"),
          cos(col(qVec), col("centVec")).as("cosine")),
      nprobe, qId, "centId")
      .select(col(qId), col("centId"))
    val rec = pqReconstruct(corpus, dim, subspaces, pqStep, cId, cVec)
    val scored = probes.join(assign, Seq("centId"))
      .join(rec, Seq(cId))
      .join(broadcast(queries), Seq(qId))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine",
          col(qVec).cast("array<double>"), col("rvec")), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Scalar (int8) quantization — the compression family's third member
    * (PQ s4/s6 compresses to sub-codes, SQ compresses each DIMENSION to
    * a signed byte): per-vector scale = max|x|/127, code_i =
    * floor(x_i/scale + 0.5) — 8x smaller search-path vectors at far
    * lower distortion than PQ (per-dim max error is scale/2, asserted
    * in SimilaritySpec). Encode/reconstruct are pure codegen'd array
    * arithmetic; scoring reconstructions is the same exact-ADC contract
    * as knnCosinePq, so the SQL oracle replays every FP step bit-equal.
    */
  private[graft] def sq8Reconstruct(corpus: DataFrame, cId: String,
                                        cVec: String): DataFrame = {
    val v = col(cVec).cast("array<double>")
    val scale = array_max(transform(v, x => abs(x))) / lit(127.0)
    corpus.select(col(cId), scale.as("_sc"),
      v.as("_v"))
      .select(col(cId),
        when(col("_sc") === 0.0, transform(col("_v"), _ => lit(0.0)))
          .otherwise(transform(col("_v"),
            x => floor(x / col("_sc") + 0.5) * col("_sc"))).as("rvec"))
  }

  /** SQ8 approximate top-k: queries score int8-reconstructed corpus
    * vectors — one broadcast-queries corpus scan + bounded_top_k, the
    * s1 plan over 8x-smaller search-path data.
    */
  def knnCosineSq8(queries: DataFrame, corpus: DataFrame, k: Int,
                   qId: String = "qid", qVec: String = "qvec",
                   cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val rec = sq8Reconstruct(corpus, cId, cVec)
    val scored = rec.crossJoin(broadcast(queries))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine",
          col(qVec).cast("array<double>"), col("rvec")), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Matryoshka (truncated-prefix) two-stage retrieval: the propose
    * stage scores cosine over only the FIRST `dPrefix` dimensions —
    * MRL-trained embeddings concentrate information in the prefix, so
    * a d/8 slice ranks candidates at d/8 the flops and bandwidth — and
    * the dispose stage re-scores the survivors exact over all
    * dimensions (the s9/s12 propose-dispose economics with dimension
    * truncation as the compression axis; on non-MRL embeddings the
    * prefix is just a random projection, which is what the measured
    * recall on the synthetic corpus reflects). Same plan shape as
    * [[knnCosine]] twice: broadcast queries, one corpus scan per
    * stage, candidates gathered by an id-only broadcast.
    */
  def knnCosineMrl(queries: DataFrame, corpus: DataFrame, k: Int,
                   kCand: Int, dPrefix: Int, qId: String = "qid",
                   qVec: String = "qvec", cId: String = "cid",
                   cVec: String = "cvec"): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    require(dPrefix > 0, "dPrefix must be positive")
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    def prefix(v: org.apache.spark.sql.Column) =
      slice(v.cast("array<double>"), lit(1), lit(dPrefix))
    val proposals = corpus
      .select(col(cId), prefix(col(cVec)).as("_cp"))
      .crossJoin(broadcast(queries
        .select(col(qId), prefix(col(qVec)).as("_qp"))))
      .select(col(qId), col(cId),
        // rank on the rounded-5 score (the s1 contract): unrounded
        // engine cosines differ in ulps, which would let the kCand
        // boundary diverge from the oracle's ranking
        round(call_function("graft_cosine", col("_qp"), col("_cp")), 5)
          .as("_ps"))
    val cands = topKPerQuery(proposals, kCand, qId, cId, "_ps")
      .select(col(qId), col(cId)) // prefix score + rank die here
    val scored = corpus
      .join(broadcast(cands), Seq(cId))
      .join(broadcast(queries), Seq(qId))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine",
          col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Binary-quantized two-stage retrieval (1 bit per dimension — the
    * extreme-compression serving shape): the propose stage scores
    * sign-bit DISAGREEMENT (Hamming distance over the per-dim sign
    * pattern — for centered data it tracks angular distance, the
    * simhash argument) and keeps `kCand` candidates per query through
    * the bounded_top_k heap on (−hamming desc ≡ hamming asc, id asc);
    * the dispose stage gathers ONLY those candidates — an id-only
    * broadcast against the corpus scan, no corpus shuffle — and
    * re-scores exact cosine for the final top-k (the s9 propose/dispose
    * economics with a 32-64× cheaper first stage than PQ codes). Sign
    * patterns travel as dim-char bit strings for oracle portability;
    * the 64-bit word packing this compresses to in production is the
    * d3/m6 family's demonstrated trick.
    */
  def knnCosineBq(queries: DataFrame, corpus: DataFrame, k: Int,
                  kCand: Int, qId: String = "qid", qVec: String = "qvec",
                  cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    def signBits(v: org.apache.spark.sql.Column) =
      array_join(transform(v.cast("array<double>"),
        x => when(x > 0, lit("1")).otherwise(lit("0"))), "")
    val proposals = corpus
      .select(col(cId), signBits(col(cVec)).as("_cb"))
      .crossJoin(broadcast(queries
        .select(col(qId), signBits(col(qVec)).as("_qb"))))
      .select(col(qId), col(cId),
        (-graft.functions.hashing.hammingDist(col("_qb"), col("_cb")))
          .cast("double").as("_nh"))
    val cands = topKPerQuery(proposals, kCand, qId, cId, "_nh")
      .select(col(qId), col(cId)) // sign-stage score + rank die here
    val scored = corpus
      .join(broadcast(cands), Seq(cId))
      .join(broadcast(queries), Seq(qId))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine",
          col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Two-stage retrieval (the production serving shape): the cheap
    * IVF-PQ first stage proposes `kCand` candidates per query from
    * compressed codes, then the second stage re-scores ONLY those
    * candidates against the true full-precision vectors and keeps the
    * final top-k. This is how ADC scoring error is bought back: the
    * search path still holds `subspaces` codes per corpus vector, and
    * full vectors are fetched for just |queries|·kCand candidate rows —
    * as an id-only BROADCAST against the corpus scan, so the gather
    * needs no corpus shuffle. Final scores are exact cosines, so the
    * output ranking restricted to the candidate set equals [[knnCosine]]
    * restricted to it (asserted in SimilaritySpec).
    */
  def rerankIvfPq(queries: DataFrame, corpus: DataFrame, k: Int,
                  kCand: Int, ivfStep: Long, nprobe: Int,
                  dim: Int, subspaces: Int, pqStep: Long,
                  qId: String = "qid", qVec: String = "qvec",
                  cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    require(kCand >= k, s"kCand ($kCand) must be >= k ($k)")
    val cands = knnCosineIvfPq(queries, corpus, kCand, ivfStep, nprobe,
      dim, subspaces, pqStep, qId, qVec, cId, cVec)
      .select(col(qId), col(cId)) // ADC score + rank die here: ids only
    val scored = corpus
      .join(broadcast(cands), Seq(cId))
      .join(broadcast(queries), Seq(qId))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine",
          col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5).as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }

  /** Approximate top-k: candidates restricted to the query's sign-bit LSH
    * bucket. Bucket on the first `bits` dimensions' signs; recall can be
    * raised by lowering `bits` (bigger buckets) or probing neighbor buckets.
    */
  /** `multiProbe = true` additionally probes every bucket at Hamming
    * distance 1 from the query's bucket (the standard multi-probe LSH
    * recall fix: a near neighbor differing in ONE borderline sign bit is
    * still found, at bits+1 probe keys per query instead of 2^bits larger
    * buckets). Corpus vectors keep a single bucket, so (query, corpus)
    * candidates stay unique and no dedup shuffle is needed.
    */
  /** k-NN GRAPH over one vector corpus — every vector's k nearest
    * OTHERS by cosine (the input SemDeDup-style semantic clustering and
    * graph-based dedup resolution consume). The all-pairs problem is
    * bounded the s2 way from both sides: sign-LSH buckets generate
    * candidates via a SELF-join whose two sides reuse the one
    * bucket-keyed exchange (the d2 fusion), a deterministic per-bucket
    * cap bounds pairs at O(buckets * cap²) regardless of corpus size
    * (recall-only, id-ordered so the oracle replays it), and the final
    * cut is bounded_top_k — at most k rows per node leave each map
    * task. Recall is the LSH tradeoff; raise bits for smaller buckets
    * or cap for more candidates.
    */
  /** SemDeDup (Abbas et al. 2023): semantic near-duplicate removal over
    * an embedding corpus — cluster first, then compare cosines ONLY
    * within clusters, which is what makes the all-pairs problem
    * tractable: the quadratic term is per-cluster, and the cluster
    * count scales with the corpus (centStep fixes the vectors-per-
    * centroid ratio). Clustering is the training-free
    * [[sampleCodebook]] + [[coarseAssignRowwise]] composition (ZERO
    * shuffles on the corpus side — swap in [[kmeansCodebook]] for
    * trained clusters without touching the plan); within a cluster,
    * a vector is a duplicate when ANY lower-id cluster-mate sits within
    * the ε-ball (rounded-5 cosine ≥ tau — the portability contract),
    * so the keeper of every duplicate chain is its smallest id (the
    * paper keeps a random member; lowest-id is the deterministic
    * choice). Per-cluster caps are deliberately ABSENT: unlike the
    * recall-only [[knnGraph]], dropping members would silently KEEP
    * true duplicates — skewed clusters are the trained-codebook /
    * larger-nlist tuning knob instead.
    *
    * Plan: assignment map-side; the pair join's two sides reuse ONE
    * cluster-keyed exchange; verdicts (distinct dup ids) join back
    * id-keyed. Output: (vec_id, cluster_id, dup).
    */
  def semDedup(corpus: DataFrame, centStep: Long, tau: Double,
               cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val assigned = coarseAssignRowwise(corpus,
      sampleCodebook(corpus, centStep, cId, cVec), cId, cVec,
      keep = Seq(cVec))
      .select(col("vec_id"), col(cVec).cast("array<double>").as("_v"),
        col("list_id"))
    val l = assigned.select(col("list_id"), col("vec_id").as("id_a"),
      col("_v").as("_va"))
    val r = assigned.select(col("list_id"), col("vec_id").as("id_b"),
      col("_v").as("_vb"))
    val dupIds = l.join(r, Seq("list_id"))
      .where(col("id_a") < col("id_b") &&
        round(call_function("graft_cosine", col("_va"), col("_vb")), 5)
          >= tau)
      .select(col("id_b").as("vec_id")).distinct()
    assigned.select(col("vec_id"), col("list_id").as("cluster_id"))
      .join(dupIds.withColumn("dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"),
        coalesce(col("dup"), lit(false)).as("dup"))
  }

  def knnGraph(corpus: DataFrame, k: Int, bits: Int,
               idCol: String = "id", vecCol: String = "vec",
               maxBucketSize: Int = 200): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val capped = corpus
      .select(col(idCol).as("_id"), col(vecCol).as("_vec"),
        vectors.signBucket(col(vecCol), bits).as("_bucket"))
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col("_bucket")).orderBy(col("_id"))))
      .where(col("_rn") <= maxBucketSize).drop("_rn")
    val l = capped.select(col("_bucket"), col("_id").as("id"),
      col("_vec").as("_v1"))
    val r = capped.select(col("_bucket"), col("_id").as("neighbor"),
      col("_vec").as("_v2"))
    val scored = l.join(r, Seq("_bucket"))
      .where(col("id") =!= col("neighbor"))
      .select(col("id"), col("neighbor"),
        round(call_function("graft_cosine",
          col("_v1").cast("array<double>"),
          col("_v2").cast("array<double>")), 5).as("cosine"))
    topKPerQuery(scored, k, "id", "neighbor")
  }

  /** MMR-diversified top-k (Carbonell & Goldstein 1998) — the
    * DIVERSIFICATION stage after propose/rerank (s9 maximizes pure
    * relevance; near-duplicate corpora then return k copies of one
    * answer): greedily select k of a `poolSize` candidate pool, each
    * round maximizing λ·rel(c) − (1−λ)·max_{s∈selected} cos(c, s),
    * ties to the smallest id. Sequential by definition — but over a
    * BOUNDED pool, so the recursion runs as one per-query array fold
    * (aggregate over k rounds, exists/transform inside) on rows the
    * propose stage already shrank: no driver loop, no extra shuffle
    * beyond the candidate gather, query-level parallelism at any query
    * count. Every double (rel, pairwise sim, the λ blend) is computed
    * with the graft_cosine/rounded-fold contract so the oracle replays
    * the identical greedy walk.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, k: Int = 5,
                poolSize: Int = 10, lambda: Double = 0.7,
                qId: String = "qid", qVec: String = "qvec",
                cId: String = "cid", cVec: String = "cvec"): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val lam = lit(lambda)
    val cands = knnCosine(queries, corpus, poolSize, qId, qVec, cId, cVec)
      .select(col(qId), col(cId), col("cosine").as("rel"))
      .join(corpus.select(col(cId),
        col(cVec).cast("array<double>").as("_cv")), Seq(cId))
    val packed = cands.groupBy(col(qId))
      .agg(array_sort(collect_list(struct(col(cId).as("cid"),
        col("rel"), col("_cv").as("cv")))).as("_rest"))
    val sel0 = array().cast("array<struct<cid:bigint,mmr:double,rnk:int>>")
    val selv0 = array().cast("array<array<double>>")
    def chooseStep(acc: org.apache.spark.sql.Column,
                   i: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = {
      val scored = transform(acc.getField("rest"), c => struct(
        (lam * c.getField("rel") - (lit(1.0) - lam) *
          when(size(acc.getField("selv")) === 0, lit(0.0))
            .otherwise(aggregate(acc.getField("selv"), lit(-1.0),
              (m, sv) => greatest(m, round(call_function("graft_cosine",
                c.getField("cv"), sv), 5))))).as("m"),
        c.getField("cid").as("cid")))
      val mBest = aggregate(scored, lit(Double.NegativeInfinity),
        (a, x) => greatest(a, x.getField("m")))
      val cidBest = aggregate(
        filter(scored, x => x.getField("m") === mBest),
        lit(Long.MaxValue), (a, x) => least(a, x.getField("cid")))
      val chosen = element_at(
        filter(acc.getField("rest"), c => c.getField("cid") === cidBest),
        1)
      when(size(acc.getField("rest")) === 0, acc).otherwise(struct(
        concat(acc.getField("sel"), array(struct(
          cidBest.as("cid"), mBest.as("mmr"), i.cast("int").as("rnk"))))
          .as("sel"),
        concat(acc.getField("selv"), array(chosen.getField("cv")))
          .as("selv"),
        filter(acc.getField("rest"),
          c => c.getField("cid") =!= cidBest).as("rest")))
    }
    packed
      .select(col(qId), aggregate(
        sequence(lit(1), lit(k)),
        struct(sel0.as("sel"), selv0.as("selv"), col("_rest").as("rest")),
        chooseStep).as("_acc"))
      .select(col(qId), explode(col("_acc.sel")).as("_s"))
      .select(col(qId), col("_s.cid").as(cId), col("_s.rnk").as("rank"),
        round(col("_s.mmr"), 5).as("mmr"))
  }

  def knnCosineLsh(queries: DataFrame, corpus: DataFrame, k: Int, bits: Int,
                   qId: String = "qid", qVec: String = "qvec",
                   cId: String = "cid", cVec: String = "cvec",
                   multiProbe: Boolean = false): DataFrame = {
    graft.plans.GraftFunctions.register(corpus.sparkSession)
    val bucket = vectors.signBucket(col(qVec), bits)
    val probeSet =
      if (!multiProbe) array(bucket)
      else array(bucket +: (1 to bits).map { i =>
        concat(substring(bucket, 1, i - 1),
          when(substring(bucket, i, 1) === "1", "0").otherwise("1"),
          substring(bucket, i + 1, bits - i))
      }: _*)
    val qb = queries.withColumn("_bucket", explode(probeSet))
    val cb = corpus.withColumn("_bucket", vectors.signBucket(col(cVec), bits))
    val scored = cb.join(broadcast(qb), Seq("_bucket"))
      .select(col(qId), col(cId),
        round(call_function("graft_cosine", col(qVec).cast("array<double>"),
          col(cVec).cast("array<double>")), 5)
          .as("cosine"))
    topKPerQuery(scored, k, qId, cId)
  }
}
