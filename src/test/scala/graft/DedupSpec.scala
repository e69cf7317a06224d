package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Dedup

/** Hand-built graph cases for duplicate-cluster resolution (connected
  * components): chains force multiple propagation rounds, so convergence
  * — not just one neighbor hop — is what's asserted.
  */
class DedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("dedup-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("chains collapse to the smallest member across >1 hop") {
    val s = spark
    import s.implicits._
    // path 10-11-12-13-14-15 (diameter 5), pair 20-21, triangle 30-31-32
    val pairs = Seq((11L, 10L), (11L, 12L), (12L, 13L), (14L, 13L),
      (14L, 15L), (20L, 21L), (30L, 31L), (31L, 32L), (30L, 32L))
      .toDF("id1", "id2")
    val out = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (10L to 15L).foreach(id => assert(out(id) == ((10L, 6L)), s"node $id"))
    Seq(20L, 21L).foreach(id => assert(out(id) == ((20L, 2L))))
    Seq(30L, 31L, 32L).foreach(id => assert(out(id) == ((30L, 3L))))
    assert(out.size == 11) // singletons stay implicit
  }

  test("incremental LSH equals the full run filtered to new-doc pairs") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val newDocs = docs.where(pmod(col("doc_id"), lit(5)) === 0)
    val old = docs.where(pmod(col("doc_id"), lit(5)) =!= 0)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val inc = Dedup.minhashLshIncremental(newDocs, old,
      Dedup.minhashBuckets(old, "doc_id", "text"), "doc_id", "text")
      .collect().map(key).toSet
    val full = Dedup.minhashLsh(docs, "doc_id", "text")
      .where(col("id1") % 5 === 0 || col("id2") % 5 === 0)
      .collect().map(key).toSet
    assert(inc == full)
    assert(inc.nonEmpty)
    Dedup.releaseCaches()
  }

  test("simhash drops hot prefix buckets (skew cap), keeps small ones") {
    val s = spark
    import s.implicits._
    // 30 identical docs land in ONE simhash prefix bucket (C(30,2)=435
    // pairs uncapped); 2 identical docs elsewhere form a bucket of 2.
    val hot = (0L until 30L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val cool = Seq(
      (100L, "completely different text about spark catalyst planning"),
      (101L, "completely different text about spark catalyst planning"))
    val docs = (hot ++ cool).toDF("doc_id", "text")
    val uncapped = Dedup.simhash(docs, "doc_id", "text")
    assert(uncapped.count() == 435 + 1)
    val capped = Dedup.simhash(docs, "doc_id", "text", maxBucketSize = 10)
    val rows = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((100L, 101L))) // hot bucket gone, pair kept
    Dedup.releaseCaches()
  }

  test("fuzzyJoin drops hot blocks (skew cap), keeps small ones") {
    val s = spark
    import s.implicits._
    // 20 keys share the 4-char block "aaaa" (C(20,2)=190 candidate pairs
    // uncapped; pairwise edit distance 3 via the tripled letter, so none
    // reach the output); 2 near-identical keys block on "zzzz" and
    // survive the cap.
    val hot = (0L until 20L).map { i =>
      val l = ('a' + i.toInt).toChar
      (i, s"aaaa $l$l$l padding stuff")
    }
    val cool = Seq((100L, "zzzz target alpha"), (101L, "zzzz target alphb"))
    val docs = (hot ++ cool).toDF("doc_id", "text")
    val capped = Dedup.fuzzyJoin(docs, "doc_id", "text", maxBucketSize = 10)
    val rows = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((100L, 101L)))
    // and uncapped the hot block IS verified (edit distance filters it
    // out of the OUTPUT, but only the cap keeps it out of the JOIN)
    assert(Dedup.fuzzyJoin(docs, "doc_id", "text").count() == 1)
  }

  test("duplicateSpans merges consecutive duplicated grams into maximal " +
    "spans with exact word coordinates") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), // shares trigrams cde, def with doc 2
      (2L, "x y c d e f z w"),
      (3L, "p q r p q r p q r"), // self-repetition: every trigram dup
      (4L, "u v")) // too short for any trigram
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._2))
    assert(spans.toSeq == Seq(
      // docs 1 & 2: gram starts {2,3} -> words 2..5 ("c d e f"), 2 grams
      (1L, 2L, 5L, 2L),
      (2L, 2L, 5L, 2L),
      // doc 3: all 7 gram starts duplicated -> one span covering 0..8
      (3L, 0L, 8L, 7L)))
    // the scalar companion: duplicated fraction per doc on the same docs
    val ratios = Dedup.duplicationRatio(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(ratios(1L) == ((6L, 2L, 0.33333))) // 2 of 6 trigrams dup
    assert(ratios(3L) == ((7L, 7L, 1.0)))     // pure self-repetition
    assert(!ratios.contains(4L))              // too short for any gram
  }

  test("cutDuplicateSpans keeps the globally first occurrence and cuts " +
    "every later one, collapsing self-repetition") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"), // first owner of trigrams cde, def
      (2L, "x y c d e f z w"), // later occurrence -> words 2..5 cut
      (3L, "p q r p q r p q r"), // self-repetition -> one copy survives
      (4L, "u v")) // too short for any trigram: untouched
      .toDF("doc_id", "text")
    val cut = Dedup.cutDuplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(cut(1L) == (("a b c d e f g h", 0L))) // first occurrence kept
    assert(cut(2L) == (("x y z w", 4L)))
    // doc 3: cut gram starts {3,4,5,6} cover words 3..8; first copy stays
    assert(cut(3L) == (("p q r", 6L)))
    assert(cut(4L) == (("u v", 0L)))
  }

  test("semanticNearDup blocks by trained clusters and matches brute " +
    "force within them") {
    val s = spark
    import s.implicits._
    // two orthogonal groups: A = ids 0-9 near e1 with a growing second
    // component, B = ids 10-19 near e2. initStep=10 seeds one centroid
    // per group (ids 0 and 10), so 2 Lloyd rounds keep the groups as
    // the two clusters; cross-group cosines stay far below threshold.
    val emb = (0L to 19L).map { i =>
      if (i < 10) (i, Seq(1.0, 0.05 * i, 0.0, 0.0))
      else (i, Seq(0.05 * (i - 10), 1.0, 0.0, 0.0))
    }.toDF("vec_id", "embedding")
    val got = Dedup.semanticNearDup(emb, "vec_id", "embedding",
      threshold = 0.95, initStep = 10, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .toSet
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum)
      BigDecimal(d / n).setScale(5, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    // expected: same-GROUP pairs at brute-force cosine >= threshold
    // (clusters == groups on this data); cross-group pairs are near 0
    val vecs = (0L to 19L).map { i =>
      i -> (if (i < 10) Seq(1.0, 0.05 * i, 0.0, 0.0)
            else Seq(0.05 * (i - 10), 1.0, 0.0, 0.0))
    }.toMap
    val want = (for {
      a <- 0L to 19L; b <- (a + 1) to 19L
      if (a < 10) == (b < 10)
      c = cos(vecs(a), vecs(b)) if c >= 0.95
    } yield (a, b, c)).toSet
    assert(got == want, s"got ${got.size}, want ${want.size}")
    // the threshold actually discriminates: some same-group pairs are in,
    // some out (ids 0 and 9 diverge past 0.95)
    assert(want.nonEmpty &&
      want.size < (0 until 10).combinations(2).size * 2)
    // skew cap: clusters of 10 over a cap of 5 are dropped whole
    assert(Dedup.semanticNearDup(emb, "vec_id", "embedding",
      threshold = 0.95, initStep = 10, iters = 2,
      maxClusterSize = 5).count() == 0)
  }

  test("containment finds the quote-inside-article pair Jaccard misses, " +
    "and the df cap only lowers recall") {
    val s = spark
    import s.implicits._
    val quote = "the quick brown fox jumps over the lazy dog"
    val article = ("today our correspondent files a long report about " +
      "animals in motion " + quote +
      " which many readers found delightful and shared widely online " +
      "across several continents during the following weeks")
    val docs = Seq((1L, quote), (2L, article),
      (3L, "completely unrelated text about numerical linear algebra " +
        "routines and cache behavior")).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.9)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(5),
        r.getLong(2), r.getLong(3))).toList
    // quote: 9 words -> 7 distinct 3-grams, every one inside the article
    assert(pairs.map(_._1) == List((1L, 2L)), pairs)
    assert(pairs.head._2 == 1.0 && pairs.head._3 == 7L &&
      pairs.head._4 == 7L, pairs)
    // the same pair's Jaccard is far below any dedup threshold — the
    // reason the asymmetric measure exists
    val j = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
      threshold = 0.01, wordGrams = true)
      .where(org.apache.spark.sql.functions.col("id1") === 1)
      .collect()
    assert(j.forall(_.getDouble(2) < 0.5), j.toSeq)
    // df cap: with maxDf = 1 every gram the pair shares is "hot" only if
    // shared by >1 doc — shared grams have df 2, so the cap drops them
    // all and the pair disappears (recall-only, never a false positive)
    assert(Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
      threshold = 0.1, maxDf = 1).count() == 0)
  }

  test("winnowing: shared runs of window+k-1 words share a fingerprint, " +
    "selection matches brute force") {
    val s = spark
    import s.implicits._
    import graft.operators.Winnowing
    val k = 3
    val w = 4
    // a shared run of w+k-1 = 6 words embedded in different contexts
    val run = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, "one two three " + run + " four five six"),
      (2L, "seven eight " + run + " nine ten eleven twelve"),
      (3L, "unrelated words entirely different here throughout"),
      (4L, "tiny doc"), // < k words -> no grams -> no fingerprints
      (5L, "just three words")) // exactly one gram -> its own min
      .toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // the winnowing guarantee
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "docs sharing a w+k-1 run must share a fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty)
    assert(!byDoc.contains(4L), "sub-k doc emits nothing")
    assert(byDoc(5L).size == 1, "single-gram doc emits its own hash")

    // brute-force replay of the selection for doc 1
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val words1 = "[a-z]+".r.findAllIn(
      "one two three " + run + " four five six").toVector
    val hashes = words1.sliding(k).map(_.mkString(" "))
      .map(g => java.lang.Long.parseLong(md5hex(g).take(15), 16)).toVector
    val expected = hashes.sliding(w).map(_.min).toSet
    assert(byDoc(1L) == expected, "selection must match brute force")

    // rollup keeps only shared fingerprints with ordered member lists
    val shared = Winnowing.sharedFingerprints(docs, "doc_id", "text", k, w)
      .collect()
    assert(shared.nonEmpty &&
      shared.forall(r => r.getLong(1) >= 2 &&
        r.getString(2) == "1;2"))
  }

  test("winnowPairs scores a mid-document shared run, cap kills pairs") {
    val s = spark
    import s.implicits._
    import graft.operators.Winnowing
    val run = ("zeta eta theta iota kappa lambda mu nu xi omicron pi rho " +
      "sigma tau upsilon phi chi psi omega alef")
    val docs = Seq(
      (1L, "intro words about one topic " + run + " closing remarks here"),
      (2L, "completely different opening paragraph text " + run +
        " and an unrelated ending about other things entirely"),
      (3L, "nothing in common with either of the previous documents " +
        "at all in any words whatsoever"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.winnowPairs(docs, "doc_id", "text",
      minShared = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(5)).toMap
    assert(pairs.contains((1L, 2L)),
      "docs sharing a 20-word run must pair")
    assert(pairs((1L, 2L)) > 0.1 && pairs((1L, 2L)) <= 1.0)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    // cap = 1: every fingerprint bucket keeps one member -> no pairs
    // (recall-only guard, never a false positive)
    assert(Winnowing.winnowPairs(docs, "doc_id", "text",
      minShared = 1, maxBucketSize = 1).count() == 0)
  }

  test("sourceOverlap: identical feeds -> 1.0, disjoint feeds -> ~0") {
    val s = spark
    import s.implicits._
    val sharedA = "alpha beta gamma delta epsilon zeta eta theta iota"
    val sharedB = "kappa lambda mu nu xi omicron pi rho sigma tau"
    val docs = Seq(
      // src1 and src2 carry the same two documents -> union shingle
      // sets identical -> merged signatures equal -> est 1.0
      (1L, sharedA, "src1"), (2L, sharedB, "src1"),
      (3L, sharedA, "src2"), (4L, sharedB, "src2"),
      // src3 shares nothing
      (5L, "uno dos tres cuatro cinco seis siete ocho nueve diez", "src3"))
      .toDF("doc_id", "text", "source")
    val out = graft.operators.Dedup.sourceOverlap(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(3)).toMap
    assert(out(("src1", "src2")) == 1.0)
    assert(out(("src1", "src3")) <= 0.2 && out(("src2", "src3")) <= 0.2)
    // doc-level split must not matter: signatures merge over the UNION
    val merged = Seq((1L, sharedA + " " + sharedB, "one"),
      (2L, sharedA, "two"), (3L, sharedB, "two"))
      .toDF("doc_id", "text", "source")
    val m = graft.operators.Dedup.sourceOverlap(merged, "source", "text")
      .collect().head
    // true J = 17/18: the one cross-doc shingle ("iota kappa") exists
    // only in 'one'. The a+i*b family is pairwise- not fully-independent
    // across slots, so one small-b shingle can win several (measured
    // 12/16 here, deterministic) — mergeability is what's being tested:
    // the estimate must be high, not boilerplate-low
    assert(m.getDouble(3) >= 0.7, m.toString)
  }

  test("labelPropagation: a barbell graph settles into its two " +
    "triangles (hand-walked 4 synchronous rounds)") {
    val s = spark
    import s.implicits._
    // triangles {1,2,3} and {4,5,6} bridged by 3-4; the sync rounds
    // walked by hand give labels 1/1/1 and 3/3/3 after round 4
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val out = graft.operators.PageRank.labelPropagation(edges, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), out.toString)
  }

  test("triangleCount: K4 plus pendant = 4 triangles, clustering 0.8; " +
    "duplicates/reversals/self-loops canonicalize away") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (4 triangles) + pendant 4-5; noise: a reversed
    // duplicate, an exact duplicate and a self-loop must not change
    // anything. Degrees 3,3,3,4,1 -> wedges 3+3+3+6+0 = 15,
    // clustering = 3*4/15 = 0.8
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L),
      (2L, 1L), (3L, 2L), (5L, 5L)).toDF("src", "dst")
    val r = graft.operators.PageRank.triangleCount(edges).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 7L &&
      r.getLong(2) == 4L && r.getDouble(3) == 0.8, r.toString)
  }

  test("bloomDedup: resubmitted text is a hit+dup, fresh text is " +
    "neither, bloom_hit always covers is_dup") {
    val s = spark
    import s.implicits._
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"),
      (3L, "zeta eta theta")).toDF("doc_id", "text")
    val newDocs = Seq((10L, "delta epsilon"), // exact resubmission
      (11L, "delta epsilon iota"),            // perturbed
      (12L, "totally fresh text")).toDF("doc_id", "text")
    val out = Dedup.bloomDedup(newDocs, corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(out(10L) == ((true, true)))
    assert(!out(11L)._2 && !out(12L)._2)
    assert(out.values.forall { case (hit, dup) => hit || !dup },
      "a true dup can never miss the bloom (no false negatives)")
  }
}
