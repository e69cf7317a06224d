package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.scalacheck.rng.Seed
import org.scalacheck.Gen
import graft.operators.{AsOfJoin, Sketches}

/** Randomized-but-reproducible invariant checks (fixed ScalaCheck seeds,
  * data generated once per test): the operators' algebraic contracts hold
  * on inputs no hand-written fixture would cover — as-of joins against a
  * brute-force reference, quantile sketches against exact ranks, CMS
  * overcounting on adversarial collisions.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("property-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("canonicalUrl is idempotent and collapses every messy variant " +
    "of a canonical URL to it") {
    val s = spark
    import s.implicits._
    import graft.functions.text
    // generate canonical forms, then messy variants: scheme/host case
    // flips, a scheme-default port, tracking params spliced at random
    // positions, a fragment
    val gen = Gen.listOfN(200, for {
      scheme <- Gen.oneOf("http", "https")
      host <- Gen.listOfN(6, Gen.alphaLowerChar).map(_.mkString)
      path <- Gen.oneOf("", "/x", "/A/b", "/p/q/R")
      params <- Gen.someOf(Seq("a=1", "b=2", "c=x")).map(_.sorted)
      upHost <- Gen.oneOf(true, false)
      upScheme <- Gen.oneOf(true, false)
      port <- Gen.oneOf(true, false)
      track <- Gen.someOf(Seq("utm_source=s", "gclid=9", "ref=r"))
      frag <- Gen.oneOf("", "#top")
    } yield {
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      val canonical =
        s"$scheme://$host.com${if (path.isEmpty) "/" else path}$q"
      val allParams = (params ++ track).reverse // unsorted on purpose
      val mq = if (allParams.isEmpty) "" else "?" + allParams.mkString("&")
      val p = if (port) (if (scheme == "http") ":80" else ":443") else ""
      val messy = (if (upScheme) scheme.toUpperCase else scheme) +
        "://" + (if (upHost) s"$host.COM" else s"$host.com") + p +
        path + mq + frag
      (messy, canonical)
    })
    val rows = sample(gen, 47L).toDF("messy", "expected")
    val out = rows
      .withColumn("got", text.canonicalUrl(col("messy")))
      .withColumn("again", text.canonicalUrl(col("got")))
    val bad = out.where(col("got") =!= col("expected") ||
      col("again") =!= col("got")).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("pileup base counts == brute-force CIGAR walk on random reads") {
    val s = spark
    import s.implicits._
    import graft.operators.Pileup
    // random reads: 1-6 CIGAR ops drawn from M/I/D/N/S with small
    // lengths, sequence sized to exactly the read-consuming total
    val gen = Gen.listOfN(120, for {
      chrom <- Gen.oneOf("1", "2")
      pos <- Gen.choose(1L, 60L)
      ops <- Gen.listOfN(6, for {
        op <- Gen.oneOf("M", "I", "D", "N", "S")
        len <- Gen.choose(1, 5)
      } yield (op, len)).map(_.take(3))
    } yield {
      val readLen = ops.collect {
        case (o, l) if "MIS".contains(o) => l
      }.sum
      val seq = Iterator.continually("ACGT").flatten.take(readLen)
        .mkString
      val cigar = ops.map { case (o, l) => s"$l$o" }.mkString
      (chrom, pos, cigar, seq)
    })
    val reads = sample(gen, 91L).filter(_._4.nonEmpty)
    // brute force: walk each CIGAR op by op
    val expected = scala.collection.mutable.Map
      .empty[(String, Long), scala.collection.mutable.Map[Char, Long]]
    for ((chrom, pos, cigar, seq) <- reads) {
      var refOff = 0L; var readOff = 0
      "(\\d+)([MIDNS])".r.findAllMatchIn(cigar).foreach { m =>
        val len = m.group(1).toInt; val op = m.group(2)
        if (op == "M") {
          for (k <- 0 until len) {
            val base = seq(readOff + k)
            val byBase = expected.getOrElseUpdate((chrom, pos + refOff + k),
              scala.collection.mutable.Map.empty)
            byBase(base) = byBase.getOrElse(base, 0L) + 1L
          }
        }
        if (op == "M" || op == "D" || op == "N") refOff += len
        if (op == "M" || op == "I" || op == "S") readOff += len
      }
    }
    val got = Pileup.baseCounts(
      reads.toDF("chrom", "pos", "cigar", "seq")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got.keySet == expected.keySet)
    for ((key, byBase) <- expected) {
      val w = got(key)
      assert(w == ((byBase.getOrElse('A', 0L), byBase.getOrElse('C', 0L),
        byBase.getOrElse('G', 0L), byBase.getOrElse('T', 0L),
        byBase.values.sum)), s"$key: $w vs $byBase")
    }
  }

  test("as-of join == brute-force latest-at-or-before on random data") {
    val s = spark
    import s.implicits._
    val gen = for {
      lefts <- Gen.listOfN(120, for {
        k <- Gen.choose(0, 5); t <- Gen.choose(0L, 50L)
      } yield (k.toString, t))
      rights <- Gen.listOfN(80, for {
        k <- Gen.choose(0, 5); t <- Gen.choose(0L, 50L)
        v <- Gen.choose(0, 999)
      } yield (k.toString, t, v.toLong))
    } yield (lefts, rights)
    for (seed <- 1L to 5L) {
      val (lefts, rights) = sample(gen, seed)
      val l = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("lid", "k", "t")
      val r = rights.toDF("k", "t", "v")
      val got = AsOfJoin.asofBackward(l, r, "k", "t", "t",
        Seq("v"), rightTieBreak = "v")
        .collect().map(x => x.getLong(0) ->
          Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
      // brute force: for each left row, max v among max-ts rights <= t
      val expect = lefts.zipWithIndex.map { case ((k, t), i) =>
        val cands = rights.filter(x => x._1 == k && x._2 <= t)
        i.toLong -> (if (cands.isEmpty) None else {
          val mt = cands.map(_._2).max
          Some(cands.filter(_._2 == mt).map(_._3).max)
        })
      }.toMap
      assert(got == expect, s"seed $seed")
    }
  }

  test("fuzzyJoin == brute-force edit-distance pairs within blocks") {
    val s = spark
    import s.implicits._
    // small alphabet + short words force prefix collisions AND edit-
    // distance hits; brute force replicates the 4-char-block contract
    val gen = Gen.listOfN(60, for {
      w <- Gen.listOfN(8, Gen.oneOf("abcd".toSeq)).map(_.mkString)
      pad <- Gen.oneOf("", " xyz", " qq")
    } yield w + pad)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (seed <- 1L to 3L) {
      val texts = sample(gen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.Dedup.fuzzyJoin(
        texts.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      graft.operators.Dedup.releaseCaches()
      def key(t: String) =
        t.toLowerCase.filter(c => c >= 'a' && c <= 'z').take(12)
      val expect = (for {
        (t1, i1) <- texts.map(t => (key(t._2), t._1))
        (t2, i2) <- texts.map(t => (key(t._2), t._1))
        if i1 < i2 && t1.take(4) == t2.take(4) && lev(t1, t2) <= 2
      } yield (i1, i2, lev(t1, t2).toLong)).toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("histogram quantile within one binWidth of the exact quantile") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(500, Gen.choose(0.0, 9999.0))
    for (seed <- 1L to 3L) {
      val xs = sample(gen, seed)
      val df = xs.map(("g", _)).toDF("g", "v")
      val out = Sketches.histQuantiles(df, Seq("g"), "v", binWidth = 100.0,
        quantiles = Seq("p50" -> 0.5, "p90" -> 0.9)).collect()(0)
      val sorted = xs.sorted
      def exact(q: Double) = sorted((q * xs.size).ceil.toInt - 1)
      // the reported bucket lower bound brackets the exact quantile
      assert(out.getDouble(1) <= exact(0.5) &&
        exact(0.5) < out.getDouble(1) + 100.0, s"seed $seed p50")
      assert(out.getDouble(2) <= exact(0.9) &&
        exact(0.9) < out.getDouble(2) + 100.0, s"seed $seed p90")
    }
  }

  test("CMS never undercounts under forced collisions (tiny width)") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(400, Gen.choose(0L, 30L))
    for (seed <- 1L to 3L) {
      val xs = sample(gen, seed)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // width 8 forces heavy collisions: estimates inflate, never deflate
      val rows = Sketches.cmsTopK(xs.toDF("v"), "v", k = 31,
        depth = 3, width = 8).collect()
      rows.foreach { r =>
        assert(r.getLong(2) >= truth(r.getLong(0)),
          s"seed $seed value ${r.getLong(0)}")
        assert(r.getLong(1) == truth(r.getLong(0)))
      }
    }
  }

  test("incremental LSH dedup == full-corpus run filtered to the batch, " +
    "on random corpora") {
    val s = spark
    import s.implicits._
    // random base docs plus one-word-mutated copies: the copies share
    // most shingles (J ~ 0.6-0.8), so real pairs cross the 0.5 verify
    // threshold and the incremental path exercises shared buckets
    val gen = Gen.listOfN(15,
      Gen.listOfN(8, Gen.oneOf("red", "green", "blue", "cyan", "plum",
        "teal")).map(_.mkString(" ")))
    for (seed <- 4L to 6L) {
      val bases = sample(gen, seed)
      val variants = bases.take(8).map(t =>
        t.split(" ").dropRight(1).mkString(" ") + " zebra")
      val texts = (bases ++ variants).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val docs = texts.toDF("doc_id", "text")
      val newDocs = docs.where(col("doc_id") % 4 === 0)
      val old = docs.where(col("doc_id") % 4 =!= 0)
      val got = graft.operators.Dedup.minhashLshIncremental(
        newDocs, old,
        graft.operators.Dedup.minhashBuckets(old, "doc_id", "text"),
        "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      graft.operators.Dedup.releaseCaches()
      val expect = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .filter(p => p._1 % 4 == 0 || p._2 % 4 == 0)
        .toSet
      graft.operators.Dedup.releaseCaches()
      assert(got == expect, s"seed $seed")
      assert(expect.nonEmpty, s"seed $seed produced no pairs — " +
        "weaken the vocab so the property actually bites")
      // the streaming ingest gate is the CROSS slice of the same truth:
      // one side arriving, one side indexed, reoriented (new_id, dup_id)
      val streamGot = graft.streaming.StreamDedup.ingestDedup(
        newDocs, old,
        graft.operators.Dedup.capIndex(
          graft.operators.Dedup.minhashBuckets(old, "doc_id", "text")),
        "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      graft.operators.Dedup.releaseCaches()
      val streamExpect = expect
        .filter(p => (p._1 % 4 == 0) != (p._2 % 4 == 0))
        .map(p => if (p._1 % 4 == 0) p else (p._2, p._1, p._3))
      assert(streamGot == streamExpect, s"seed $seed (stream)")
    }
  }

  test("duplicateSpans == brute-force maximal duplicated-gram runs") {
    val s = spark
    import s.implicits._
    // tiny vocab + short docs force heavy n-gram collisions, including
    // within-doc repetition and spans that touch document edges
    val gen = Gen.listOfN(30,
      Gen.listOfN(12, Gen.oneOf("aa", "bb", "cc", "dd"))
        .map(_.mkString(" ")))
    val n = 3
    for (seed <- 1L to 3L) {
      val texts = sample(gen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.Dedup.duplicateSpans(
        texts.toDF("doc_id", "text"), "doc_id", "text", n = n)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      // brute force: count every n-gram corpus-wide, mark duplicated
      // positions, merge consecutive runs per doc
      val words = texts.map { case (id, t) =>
        id -> t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq }
      val grams = words.flatMap { case (id, ws) =>
        ws.sliding(n).zipWithIndex.collect {
          case (g, p) if g.length == n => (id, p.toLong, g.mkString(" ")) }
      }
      val freq = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val expect = grams.filter(g => freq(g._3) >= 2)
        .groupBy(_._1).flatMap { case (id, gs) =>
          val ps = gs.map(_._2).sorted
          // split into consecutive runs
          ps.foldLeft(List.empty[List[Long]]) {
            case (acc @ (run :: rest), p) if run.head == p - 1 =>
              (p :: run) :: rest
            case (acc, p) => List(p) :: acc
          }.map(run => (id, run.min, run.max + n - 1, run.size.toLong))
        }.toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("nearest-interval join == brute force on random intervals") {
    val s = spark
    import s.implicits._
    val ivGen = for {
      start <- Gen.chooseNum(0L, 500L)
      len <- Gen.chooseNum(0L, 120L)
    } yield (start, start + len)
    for (seed <- 1L to 15L) {
      val ivs = sample(Gen.listOfN(12, ivGen), seed).zipWithIndex
        .map { case ((st, en), i) => ("c", s"iv$i", st, en) }
      val pts = sample(Gen.listOfN(20, Gen.chooseNum(0L, 700L)), seed + 1000)
        .zipWithIndex.map { case (p, i) => ("c", p, s"p$i") }
      val radius = 40L
      val got = graft.operators.IntervalJoin.nearestInterval(
        pts.toDF("chrom", "pos", "id"),
        ivs.toDF("chrom", "transcript_id", "start", "end"),
        "transcript_id", Seq("chrom"), radius, binSize = 32L)
        .collect()
        .map(r => (r.getString(2), r.getLong(3), r.getString(4))).toSet
      val expect = pts.flatMap { case (_, pos, pid) =>
        val cands = ivs.map { case (_, iv, st, en) =>
          (math.max(math.max(st - pos, pos - en), 0L), iv)
        }.filter(_._1 <= radius)
        if (cands.isEmpty) None
        else { val m = cands.min; Some((pid, m._1, m._2)) }
      }.toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("changelog apply == brute force on random I/U/D streams") {
    val s = spark
    import s.implicits._
    val chGen = for {
      key <- Gen.chooseNum(1L, 12L)
      op <- Gen.oneOf("I", "U", "D")
      v <- Gen.chooseNum(0, 999)
    } yield (key, op, v.toDouble)
    for (seed <- 1L to 15L) {
      val snap = (1L to 8L).map(k => (k, k * 10.0))
      val changes = sample(Gen.listOfN(25, chGen), seed).zipWithIndex
        .map { case ((k, op, v), i) => (k, i.toLong, op, v) }
      val got = graft.operators.TableOps.applyChangelog(
        snap.toDF("id", "val"),
        changes.toDF("id", "seq", "op", "val"),
        "id", "op", "seq", Seq("val"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val latest = changes.groupBy(_._1).map { case (k, cs) =>
        k -> cs.maxBy(_._2)
      }
      val expect = ((1L to 8L) ++ changes.map(_._1)).distinct.flatMap { k =>
        latest.get(k) match {
          case Some((_, _, "D", _)) => None
          case Some((_, _, _, v)) => Some((k, v))
          case None => snap.find(_._1 == k).map(x => (x._1, x._2))
        }
      }.toSet
      assert(got == expect, s"seed $seed")
    }
  }

  test("repetition metrics == brute-force gram counting on random docs") {
    val s = spark
    import s.implicits._
    val wordGen = Gen.oneOf("aa", "bb", "cc", "dd", "longerword")
    val docGen = Gen.chooseNum(0, 30)
      .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
    for (seed <- 1L to 40L) {
      val txt = sample(docGen, seed)
      val df = Seq((1L, txt)).toDF("doc_id", "text")
        .select(graft.functions.text.topNgramCharFrac(col("text"), 2)
          .as("top2"),
          graft.functions.text.dupNgramCharFrac(col("text"), 3).as("dup3"))
      val (gotTop, gotDup) =
        df.collect().map(r => (r.getDouble(0), r.getDouble(1))).head
      val tk = txt.trim.split("\\s+").filter(_.nonEmpty)
      def grams(n: Int) = (0 to tk.length - n)
        .map(i => tk.slice(i, i + n).mkString(" "))
      def r5(d: Double) = BigDecimal(d)
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      val len = math.max(txt.length, 1)
      val c2 = grams(2).groupBy(identity).view.mapValues(_.size)
      val expTop =
        if (c2.isEmpty) 0.0
        else {
          val mx = c2.values.max
          val g = c2.filter(_._2 == mx).keys.min
          r5(mx.toLong * g.length / len.toDouble)
        }
      val c3 = grams(3).groupBy(identity).view.mapValues(_.size)
      val expDup = r5(math.min(
        c3.filter(_._2 >= 2).map { case (g, n) => n.toLong * g.length }
          .sum / len.toDouble, 1.0))
      assert(gotTop == expTop, s"seed $seed top2 '$txt'")
      assert(gotDup == expDup, s"seed $seed dup3 '$txt'")
    }
  }

  test("coverage segments == brute-force per-base depth on random " +
    "intervals") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(60, for {
      chrom <- Gen.oneOf("c1", "c2")
      start <- Gen.choose(1L, 300L)
      len <- Gen.choose(0L, 80L)
    } yield (chrom, start, start + len))
    for (seed <- 1L to 3L) {
      val ivs = sample(gen, seed)
      val got = graft.operators.Coverage
        .coverage(ivs.toDF("chrom", "start", "end"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3)))
      // brute force: per-base depth over the union of bases
      val perBase: Map[(String, Long), Long] = ivs
        .flatMap { case (c, a, b) => (a to b).map(p => (c, p)) }
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      // every emitted segment must be constant-depth and correct
      got.foreach { case (c, a, b, d) =>
        (a to b).foreach { p =>
          assert(perBase.getOrElse((c, p), 0L) == d,
            s"seed $seed base ($c,$p): seg depth $d != brute " +
              s"${perBase.getOrElse((c, p), 0L)}")
        }
      }
      // and the segments must cover every covered base exactly once
      val segBases = got.flatMap { case (c, a, b, _) =>
        (a to b).map(p => (c, p))
      }
      assert(segBases.length == segBases.distinct.length,
        s"seed $seed overlapping segments")
      assert(segBases.toSet == perBase.keySet, s"seed $seed base cover")
      // maximality: adjacent same-chrom segments never share a depth
      got.groupBy(_._1).foreach { case (_, segs) =>
        segs.sortBy(_._2).sliding(2).foreach {
          case Array(x, y) =>
            if (x._3 + 1 == y._2)
              assert(x._4 != y._4, s"seed $seed non-maximal: $x $y")
          case _ =>
        }
      }
    }
  }

  test("containment pairs == brute-force gram-set arithmetic on random " +
    "docs") {
    val s = spark
    import s.implicits._
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val gen = Gen.listOfN(14, Gen.choose(3, 16).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" "))))
    for (seed <- 1L to 3L) {
      val texts = sample(gen, seed)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val thr = 0.5
      val got = graft.operators.Dedup.containmentPairs(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = thr, maxDf = 1000)
        .collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      def grams(t: String): Set[String] = {
        val w = t.split(" ").toVector
        (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" "))
          .toSet
      }
      val exp = (for {
        a <- docs; b <- docs if a._1 < b._1
        ga = grams(a._2); gb = grams(b._2)
        shared = (ga & gb).size
        cont = BigDecimal(shared.toDouble / math.min(ga.size, gb.size))
          .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
        if shared > 0 && cont >= thr
      } yield (a._1, b._1) -> (shared.toLong, ga.size.toLong,
        gb.size.toLong, cont)).toMap
      assert(got == exp, s"seed $seed: got ${got.keySet} exp " +
        s"${exp.keySet}")
      graft.operators.Dedup.releaseCaches()
    }
  }

  test("HWE counts/freqs/chi2 == brute force on random genotype matrices") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val gts = (0 until 30).flatMap { v =>
      (0 until 25).map { sm =>
        val gt = rnd.nextInt(5) match {
          case 0 => "0|0"
          case 1 => "0|1"
          case 2 => "1|0"
          case 3 => "1|1"
          case _ => ".|."
        }
        (s"v$v", "1", (v * 10 + 1).toLong, s"s$sm", gt)
      }
    }
    val out = graft.operators.VcfStats.hardyWeinberg(
      gts.toDF("varId", "chrom", "pos", "sample", "gt"))
      .collect().map(r => r.getString(0) -> r).toMap
    def r5(x: Double) = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    gts.groupBy(_._1).foreach { case (v, rows) =>
      val ds = rows.flatMap { t =>
        val a = t._5.split("\\|")
        if (a.contains(".")) None else Some(a.count(_ == "1"))
      }
      val row = out(v)
      if (ds.isEmpty) assert(!out.contains(v) || row.getLong(3) == 0)
      else {
        val n = ds.size.toDouble
        val (h0, h1, h2) =
          (ds.count(_ == 0), ds.count(_ == 1), ds.count(_ == 2))
        assert(row.getLong(3) == ds.size && row.getLong(4) == h0 &&
          row.getLong(5) == h1 && row.getLong(6) == h2, v)
        val pA = (2 * h2 + h1) / (2 * n)
        assert(row.getDouble(7) == r5(math.min(pA, 1 - pA)), v)
        assert(row.getDouble(8) == r5(h1 / n), v)
        if (2 * h2 + h1 > 0 && 2 * h0 + h1 > 0) {
          def dev(o: Int, e: Double) = (o - e) * (o - e) / e
          val q = 1 - pA
          val chi = dev(h0, n * q * q) + dev(h1, n * 2 * pA * q) +
            dev(h2, n * pA * pA)
          assert(math.abs(row.getDouble(10) - chi) < 1e-4, v)
        } else assert(row.isNullAt(10), v)
      }
    }
  }

  test("LD r2 == brute-force Pearson^2 on random dosages within the " +
    "window") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val nVars = 20
    val nSamples = 12
    val dosages = (0 until nVars).map { v =>
      (v, (0 until nSamples).map(_ => rnd.nextInt(3)))
    }
    val gts = dosages.flatMap { case (v, ds) =>
      ds.zipWithIndex.map { case (d, i) =>
        (s"v%02d".format(v), "1", (v * 7 + 1).toLong, s"s$i",
          if (d == 0) "0|0" else if (d == 1) "0|1" else "1|1")
      }
    }
    val maxDist = 20L
    val out = graft.operators.VcfStats.ldPairs(
      gts.toDF("varId", "chrom", "pos", "sample", "gt"), maxDist)
      .collect().map(r => (r.getString(1), r.getString(3)) ->
        (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    def r5(x: Double) = BigDecimal(x)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    var checked = 0
    for (a <- 0 until nVars; b <- 0 until nVars if a < b) {
      val posA = a * 7 + 1
      val posB = b * 7 + 1
      val key = (s"v%02d".format(a), s"v%02d".format(b))
      if (posB - posA <= maxDist) {
        val xs = dosages(a)._2.map(_.toDouble)
        val ys = dosages(b)._2.map(_.toDouble)
        val n = nSamples.toDouble
        val (sx, sy) = (xs.sum, ys.sum)
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        val vx = n * xs.map(x => x * x).sum - sx * sx
        val vy = n * ys.map(y => y * y).sum - sy * sy
        if (vx > 0 && vy > 0) {
          val num = n * sxy - sx * sy
          val expect = r5(num * num / (vx * vy))
          assert(math.abs(out(key).get - expect) < 1e-9, key)
          checked += 1
        } else assert(out(key).isEmpty, key)
      } else assert(!out.contains(key), s"$key beyond window")
    }
    assert(checked > 10, "the generator must produce real pairs")
  }

  test("interval merge/subtract == brute-force per-base sets on random " +
    "intervals") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(23)
    def mk(n: Int) = (0 until n).map { i =>
      val st = rnd.nextInt(200).toLong + 1
      (if (i % 2 == 0) "c1" else "c2", st, st + rnd.nextInt(30).toLong)
    }
    val aIv = mk(25).zipWithIndex.map { case ((c, st, e), i) =>
      (c, s"a$i", st, e) }
    val bIv = mk(20)
    val aDf = aIv.toDF("chrom", "id", "start", "end")
    val bDf = bIv.toDF("chrom", "start", "end")

    // merge: per-chrom union of covered bases must match, and output
    // intervals must be disjoint and non-adjacent
    val merged = graft.operators.Intervals.merge(bDf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def bases(iv: Seq[(String, Long, Long)]) =
      iv.flatMap { case (c, st, e) => (st to e).map(c -> _) }.toSet
    assert(bases(merged.toSeq.map(t => (t._1, t._2, t._3))) ==
      bases(bIv))
    merged.groupBy(_._1).values.foreach { ivs =>
      val sorted = ivs.sortBy(_._2)
      sorted.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(1)._2 > w(0)._3 + 1, "merged intervals must not touch")
      }
    }

    // cluster: labels must be exactly the merge partition — per
    // cluster_id, (min start, max end, member count) reproduces merge's
    // rows, and every input row keeps exactly one labeled output row
    val mergedFull = graft.operators.Intervals.merge(bDf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val clustered = graft.operators.Intervals.cluster(bDf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(clustered.length == bIv.length)
    val byCluster = clustered.groupBy(_._4).values.map { ivs =>
      (ivs.head._1, ivs.map(_._2).min, ivs.map(_._3).max,
        ivs.length.toLong)
    }.toSet
    assert(byCluster == mergedFull)

    // subtract: surviving bases == A bases minus B bases, per A row
    val out = graft.operators.Intervals
      .subtract(aDf, bDf, Seq("chrom"), Seq("id"), binSize = 16)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val bBases = bases(bIv)
    aIv.foreach { case (c, id, st, e) =>
      val expect = (st to e).filter(p => !bBases.contains(c -> p)).toSet
      val got = out.filter(t => t._1 == c && t._2 == id)
        .flatMap(t => t._3 to t._4).toSet
      assert(got == expect, s"row $id")
    }

    // complement: per-key, complement bases == bounded span minus
    // covered bases; a key with no intervals emits its whole span
    val bounds = Seq(("c1", 1L, 260L), ("c2", 1L, 260L),
      ("c3", 10L, 40L)).toDF("chrom", "bound_start", "bound_end")
    val comp = graft.operators.Intervals.complement(bDf, bounds)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val compBases = bases(comp.toSeq)
    val wantComp = Seq("c1", "c2").flatMap(c =>
      (1L to 260L).map(c -> _)).toSet.diff(bBases) ++
      (10L to 40L).map("c3" -> _)
    assert(compBases == wantComp)

    // jaccard: self-similarity is exactly 1 with union == |bases(A)|
    val self = graft.operators.Intervals
      .jaccard(bDf, bDf, binSize = 16).collect().head
    assert(self.getLong(0) == bases(bIv).size.toLong)
    assert(self.getLong(1) == bases(bIv).size.toLong)
    assert(self.getDouble(2) == 1.0)
    // cross: intersection/union match the brute-force base sets
    val aSet = bases(aIv.map(t => (t._1, t._3, t._4)))
    val cross = graft.operators.Intervals
      .jaccard(aDf.drop("id"), bDf, binSize = 16).collect().head
    assert(cross.getLong(0) == aSet.intersect(bBases).size.toLong)
    assert(cross.getLong(1) == aSet.union(bBases).size.toLong)
  }

  test("Intervals.cluster labels are injective in the key tuple: " +
    "':'-bearing values and multi-column keys cannot collide") {
    val s = spark
    import s.implicits._
    // the classic ambiguity: (a, b:3) vs (a:b, 3) — same naive join
    val df = Seq(
      ("a", "b:3", 10L, 20L),
      ("a:b", "3", 10L, 20L),
      // a '\'-bearing value that would alias the escape itself
      ("a\\", ":b:3", 10L, 20L),
      // null keys: concat_ws silently DROPS nulls, so without the \0
      // sentinel (null,"a") and ("a",null) collide; and a literal
      // "\0" value must stay distinct from the sentinel (it escapes
      // to \\0)
      (null.asInstanceOf[String], "a", 10L, 20L),
      ("a", null.asInstanceOf[String], 10L, 20L),
      ("\\0", "a", 10L, 20L))
      .toDF("k1", "k2", "start", "end")
    val ids = graft.operators.Intervals
      .cluster(df, keys = Seq("k1", "k2")).collect()
      .map(_.getString(4)).toSet
    assert(ids.size == 6, s"cluster_id collided: $ids")
    // single ':'-free key keeps the plain key:island shape
    val plain = graft.operators.Intervals
      .cluster(Seq(("c1", 5L, 9L)).toDF("chrom", "start", "end"))
      .collect().head.getString(3)
    assert(plain == "c1:1")
  }

  test("fimSplit reconstructs: prefix+middle+suffix words == the " +
    "original word stream; short docs pass through") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docs = (0L until 60L).map { i =>
      val n = rnd.nextInt(12) // includes <3-word pass-through cases
      (i, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val out = docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        graft.functions.text.fimSplit(col("text"), col("doc_id"), "px")
          .as("fim"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    out.foreach { case (id, orig, fim) =>
      val origWords = orig.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
      if (origWords.length < 3) assert(fim == orig, s"doc $id")
      else {
        assert(fim.startsWith("<PRE>"), s"doc $id")
        val pre = fim.substring(5, fim.indexOf("<SUF>"))
        val suf = fim.substring(fim.indexOf("<SUF>") + 5,
          fim.indexOf("<MID>"))
        val mid = fim.substring(fim.indexOf("<MID>") + 5)
        def w(x: String) = x.split(" ").filter(_.nonEmpty).toSeq
        assert(w(pre) ++ w(mid) ++ w(suf) == origWords.toSeq, s"doc $id")
      }
    }
  }

  test("weighted/mix sampling degenerate to the uniform draw when " +
    "weights are flat; targetFrac=1 keeps everything") {
    val s = spark
    import s.implicits._
    val docs = (0L until 300L)
      .map(i => (i, s"src${i % 5}", 10L + i % 7)).toDF("doc_id", "source",
        "n_chars")
    val uni = docs.where(
      graft.operators.Sampling.hashDraw(col("doc_id"), "u")
        .cast("double") < 0.3 * 4294967296.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // flat integral weights make rate_i == targetFrac for every row
    val flatW = docs.withColumn("w", lit(1L))
    val ws = graft.operators.Sampling.weightedSample(flatW, "doc_id",
      "w", targetFrac = 0.3, salt = "u")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ws == uni)
    val mix = graft.operators.Sampling.mixSample(docs, "source",
      "doc_id", Map.empty, defaultWeight = 1L, targetFrac = 0.3,
      salt = "u").select("doc_id").collect().map(_.getLong(0)).toSet
    // flat mix weights over EQUAL-SIZE sources: rate == targetFrac too
    assert(mix == uni)
    val all = graft.operators.Sampling.weightedSample(flatW, "doc_id",
      "w", targetFrac = 1.0, salt = "u").count()
    assert(all == 300L)
  }

  test("triangleCount == brute-force combinations on random graphs") {
    val s = spark
    import s.implicits._
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    val seeds = Seq(11L, 23L, 47L)
    seeds.foreach { sd =>
      val edges = gen(Gen.Parameters.default, Seed(sd)).get
      val und = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct
      val adj = und.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val brute = nodes.combinations(3).count { case Seq(x, y, z) =>
        adj((x, y)) && adj((x, z)) && adj((y, z)) }
      val wedges = nodes.map { n =>
        val d = und.count(e => e._1 == n || e._2 == n).toLong
        d * (d - 1) / 2 }.sum
      val r = graft.operators.PageRank.triangleCount(
        edges.toDF("src", "dst")).collect().head
      assert(r.getLong(2) == brute.toLong, s"seed $sd: $r vs $brute")
      assert(r.getLong(0) == nodes.size.toLong &&
        r.getLong(1) == und.size.toLong, s"seed $sd: $r")
      if (wedges > 0)
        assert(r.getDouble(3) ==
          math.rint(3.0 * brute / wedges * 100000) / 100000,
          s"seed $sd clustering")
    }
  }
}
