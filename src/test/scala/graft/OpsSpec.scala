package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{AsOfJoin, Dedup, Sketches}
import graft.functions.text

/** Hand-computed cases for the round-5 operators: as-of join semantics
  * (tie handling, no-match rows, strict mode), HLL register math,
  * chunk-level dedup boundaries, PII redaction cascade order.
  */
class OpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .appName("ops-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  test("dsir: target-like docs outscore out-of-distribution ones; " +
    "feature stream is unigrams + bigrams") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "aa bb aa cc"),   // the target doc
      (2L, "aa bb aa cc"),   // identical to target -> max weight
      (3L, "aa bb zz yy"),   // half-overlapping
      (4L, "zz yy xx ww")    // disjoint -> min weight
    ).toDF("doc_id", "text")
    val out = graft.operators.Dsir.importanceScores(
      docs.where(col("doc_id") <= 2), docs, "doc_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // 4 words -> 4 unigrams + 3 bigrams = 7 features
    assert(out.values.forall(_._1 == 7L))
    val w = out.view.mapValues(_._2).toMap
    assert(w(2) == w(1))                 // identical text, same score
    assert(w(2) > w(3) && w(3) > w(4))   // monotone in target overlap
    assert(out(2)._3 && !out(4)._3)      // keep = logw > 0
    assert(out.values.forall(v => v._3 == (v._2 > 0)))
  }

  test("renderChatTurns: hand-computed spans, assistant unmasked, " +
    "fingerprint matches the rendered string") {
    val s = spark
    import s.implicits._
    val turns = Seq(
      ("c1", 0L, "system", "hi"),
      ("c1", 1L, "user", "yo"),
      ("c1", 2L, "assistant", "ok!")
    ).toDF("conv_id", "turn_idx", "role", "content")
    val out = graft.operators.Packing.renderChatTurns(
      turns, "conv_id", "turn_idx", "role", "content")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(4), r.getLong(5), r.getBoolean(6),
          r.getString(7)))).toMap
    val full = "<|system|>hi<|end|><|user|>yo<|end|>" +
      "<|assistant|>ok!<|end|>"
    // 1-based spans: substring(full, start, len) must equal the content
    assert(out(0L)._1 == 11L && out(0L)._2 == 12L && out(0L)._3)
    assert(full.substring(10, 12) == "hi")
    assert(out(1L)._1 == 28L && out(1L)._2 == 29L && out(1L)._3)
    assert(full.substring(27, 29) == "yo")
    assert(out(2L)._1 == 50L && out(2L)._2 == 52L && !out(2L)._3)
    assert(full.substring(49, 52) == "ok!")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(full.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0L)._4 == fp)
  }

  test("as-of join picks latest at-or-before, null when none") {
    val s = spark
    import s.implicits._
    val trades = Seq((1L, "k", 100L, 9.0), (2L, "k", 205L, 9.5),
      (3L, "x", 50L, 1.0)).toDF("trade_id", "sym", "t", "px")
    val quotes = Seq(("k", 90L, 10L, 8.8), ("k", 100L, 11L, 8.9),
      ("k", 200L, 12L, 9.1), ("k", 300L, 13L, 9.9))
      .toDF("sym", "t", "quote_id", "bid")
    val out = AsOfJoin.asofBackward(trades, quotes, "sym", "t", "t",
      Seq("quote_id", "bid"), rightTieBreak = "quote_id")
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(4)), Option(r.get(5)))).toMap
    // trade 1 at t=100: exact-ts quote 11 wins (allowExact default)
    assert(out(1L) == ((Some(11L), Some(8.9))))
    // trade 2 at t=205: quote 12 (t=200) is latest at-or-before
    assert(out(2L) == ((Some(12L), Some(9.1))))
    // sym x has no quotes at all
    assert(out(3L) == ((None, None)))
  }

  test("as-of strict mode excludes equal timestamps; ties pick max id") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", 100L)).toDF("lid", "sym", "t")
    val right = Seq(("k", 100L, 7L), ("k", 100L, 9L), ("k", 40L, 2L))
      .toDF("sym", "t", "rid")
    val exact = AsOfJoin.asofBackward(left, right, "sym", "t", "t",
      Seq("rid"), rightTieBreak = "rid").collect()(0)
    assert(exact.getLong(3) == 9L) // max rid among the t=100 duplicates
    val strict = AsOfJoin.asofBackward(left, right, "sym", "t", "t",
      Seq("rid"), rightTieBreak = "rid", allowExact = false).collect()(0)
    assert(strict.getLong(3) == 2L) // t=100 rows excluded, falls to t=40
  }

  test("forward as-of picks earliest at-or-after; strict skips equal ts") {
    val s = spark
    import s.implicits._
    val trades = Seq((1L, "k", 100L), (2L, "k", 205L), (3L, "x", 50L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 90L, 10L), ("k", 100L, 11L), ("k", 100L, 14L),
      ("k", 300L, 13L)).toDF("sym", "t", "quote_id")
    val out = AsOfJoin.asofForward(trades, quotes, "sym", "t", "t",
      Seq("quote_id"), rightTieBreak = "quote_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // trade 1 at t=100: equal-ts quotes qualify, MIN id (11) wins forward
    assert(out(1L) == Some(11L))
    // trade 2 at t=205: next quote is t=300
    assert(out(2L) == Some(13L))
    // sym x has no quotes
    assert(out(3L) == None)
    // strict: the t=100 quotes no longer qualify for trade 1
    val strict = AsOfJoin.asofForward(trades, quotes, "sym", "t", "t",
      Seq("quote_id"), rightTieBreak = "quote_id", allowExact = false)
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(strict(1L) == Some(13L))
  }

  test("nearest as-of: closer side wins, equidistant -> backward, " +
    "exact match beats both, one-sided rows fall through") {
    val s = spark
    import s.implicits._
    val trades = Seq((1L, "k", 100L), (2L, "k", 140L), (3L, "k", 10L),
      (4L, "k", 290L), (5L, "x", 50L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(("k", 90L, 10L), ("k", 150L, 11L), ("k", 150L, 14L),
      ("k", 300L, 13L)).toDF("sym", "t", "quote_id")
    val out = AsOfJoin.asofNearest(trades, quotes, "sym", "t", "t",
      Seq("quote_id"), rightTieBreak = "quote_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // t=100: back 90 (d=10) beats fwd 150 (d=50)
    assert(out(1L) == Some(10L))
    // t=140: fwd 150 (d=10) beats back 90 (d=50); forward dup -> MIN id
    assert(out(2L) == Some(11L))
    // t=10: nothing behind -> forward side
    assert(out(3L) == Some(10L))
    // t=290: equidistant never arises here; fwd 300 (d=10) vs 150
    assert(out(4L) == Some(13L))
    // sym x: no quotes at all
    assert(out(5L) == None)
    // equidistant: back 100 and fwd 200 both d=50 -> BACKWARD wins
    val eq = AsOfJoin.asofNearest(
      Seq((9L, "k", 150L)).toDF("trade_id", "sym", "t"),
      Seq(("k", 100L, 1L), ("k", 200L, 2L)).toDF("sym", "t", "quote_id"),
      "sym", "t", "t", Seq("quote_id"), rightTieBreak = "quote_id")
      .collect()(0)
    assert(eq.getLong(3) == 1L, "equidistant must resolve backward")
  }

  test("qualityChecks: exact metrics and verdicts for all four " +
    "constraint classes") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("x"), 5.0), (1L, Some("x"), 15.0),
      (2L, Option.empty[String], 5.0), (3L, Some("y"), 5.0))
      .toDF("k", "sub", "v")
    val parent = Seq(Tuple1(1L), Tuple1(2L)).toDF("pk")
    val out = graft.operators.TableOps.qualityChecks(df,
      unique = Seq(Seq("k", "sub")),
      notNull = Seq(("sub", 0.5)),
      inRange = Seq(("v", 0.0, 10.0)),
      fk = Seq(("k", parent, "pk")))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(2), r.getBoolean(4)))).toMap
    assert(out("unique") == ((2.0, false)), out.toString)
    assert(out("not_null") == ((0.25, true)))
    assert(out("in_range") == ((1.0, false)))
    assert(out("fk") == ((1.0, false)))
  }

  test("as-of payload fields all come from the SAME right row (nulls)") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k", 10L)).toDF("lid", "sym", "t")
    // latest right row has a NULL payload field: the result must carry
    // (11, null), never stitch value 5.0 from the older row
    val right = Seq(("k", 1L, 10L, Some(5.0)), ("k", 2L, 11L, None))
      .toDF("sym", "t", "rid", "rv")
    val r = AsOfJoin.asofBackward(left, right, "sym", "t", "t",
      Seq("rid", "rv"), rightTieBreak = "rid").collect()(0)
    assert(r.getLong(3) == 11L && r.isNullAt(4), r.toString)
  }

  test("HLL estimate within the 256-register error bound") {
    val s = spark
    import s.implicits._
    val df = (1 to 2000).map(i => ("g", i % 500)).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), "v")
      .collect()(0).getDouble(1)
    // 3-sigma of 1.04/sqrt(256) = 6.5% standard error on 500 distinct
    assert(math.abs(est - 500.0) < 500 * 0.195, s"est=$est")
    // duplicates must not move the registers: same input distinct-ified
    val est2 = Sketches.hllDistinct(df.distinct(), Seq("g"), "v")
      .collect()(0).getDouble(1)
    assert(est == est2)
  }

  test("chunk dedup finds only full cross-doc chunks") {
    val s = spark
    import s.implicits._
    val shared = (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq(
      (1L, shared + " tail one extra"), // chunk 1 = shared
      (2L, shared),                     // identical first chunk
      (3L, "short doc under twenty words total"), // no full chunk
      (4L, ("x " * 19).trim)            // 19 words -> no chunk
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 20)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 2L) // n_docs
    assert(out(0).getString(3) == "1;2")
  }

  test("CMS estimate never undercounts; heavy hitter surfaces on top") {
    val s = spark
    import s.implicits._
    // skewed stream: value 7 dominates
    val df = ((1 to 300).map(_ => 7L) ++ (1 to 50).flatMap(i =>
      Seq(i.toLong + 100, i.toLong + 100))).toDF("v")
    val top = Sketches.cmsTopK(df, "v", k = 5, depth = 4, width = 64)
      .collect()
    assert(top.head.getLong(0) == 7L && top.head.getLong(3) == 1L)
    top.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), // estimate >= truth, always
        s"value ${r.getLong(0)}: est ${r.getLong(2)} < true ${r.getLong(1)}")
    }
  }

  test("CDC chunks re-align after an insertion; fixed chunks do not") {
    val s = spark
    import s.implicits._
    // 200 shared words; doc 2 prepends one word. Fixed 20-word frames all
    // shift; CDC boundaries (content-anchored) re-align after the first.
    // (alphabetic-only words — the tokenizer drops digits)
    val base = (1 to 200).map { i =>
      "" + ('a' + (i * 7) % 26).toChar + ('a' + (i * 13) % 26).toChar +
        ('a' + (i * 3) % 26).toChar + ('a' + (i * 11) % 26).toChar
    }.mkString(" ")
    val df = Seq((1L, base), (2L, "inserted " + base)).toDF("doc_id", "text")
    val cdc = Dedup.cdcChunkDedup(df, "doc_id", "text", boundaryMod = 16)
      .collect()
    val fixed = Dedup.chunkDedup(df, "doc_id", "text", chunkWords = 20)
      .collect()
    assert(cdc.length > fixed.length,
      s"cdc shared=${cdc.length} fixed shared=${fixed.length}")
    assert(cdc.forall(_.getString(3) == "1;2"))
  }

  test("overlap join emits multi-bin pairs exactly once, no self misses") {
    val s = spark
    import s.implicits._
    // overlap spans 3 shared bins (binSize 10): would triple without the
    // left-edge ownership filter
    val l = Seq(("c", "a1", 5L, 42L), ("c", "a2", 100L, 101L))
      .toDF("chrom", "lid", "start", "end")
    val r = Seq(("c", "b1", 8L, 39L), ("c", "b2", 41L, 60L),
      ("c", "b3", 43L, 50L)).toDF("chrom", "rid", "start2", "end2")
    val out = graft.operators.IntervalJoin
      .overlapJoin(l, r, Seq("chrom"), binSize = 10L)
      .select("lid", "rid").collect().map(x =>
        (x.getString(0), x.getString(1)))
    assert(out.length == out.distinct.length, "duplicate pairs emitted")
    // a1 overlaps b1 (contained-ish) and b2 (touching at 41-42), not b3
    assert(out.toSet == Set(("a1", "b1"), ("a1", "b2")))
  }

  test("nearest-interval join == brute force within radius, tie to " +
    "smallest id, multi-bin candidates claimed once") {
    val s = spark
    import s.implicits._
    // intervals spanning several bins (binSize 10) + equidistant tie
    val ivs = Seq(
      ("c", "t1", 100L, 135L),  // 4 bins
      ("c", "t2", 151L, 160L),
      ("c", "t0", 151L, 160L),  // exact tie with t2 -> t0 wins (id order)
      ("c", "t3", 500L, 505L),
      ("d", "t4", 100L, 110L))  // other chromosome must never match
      .toDF("chrom", "transcript_id", "start", "end")
    val pts = Seq(
      ("c", 120L, "inside"),      // inside t1 -> distance 0
      ("c", 142L, "between"),     // 7 from t1, 9 from t2 -> t1
      ("c", 143L, "tie"),         // 8 from t1 AND from t2/t0 -> t0
      ("c", 400L, "far"),         // 240 from t2 > radius, 100 from t3
      ("c", 9000L, "nothing"),    // nothing within radius -> no row
      ("d", 111L, "otherchrom"))  // 1 from t4 only
      .toDF("chrom", "pos", "id")
    val got = graft.operators.IntervalJoin
      .nearestInterval(pts, ivs, "transcript_id", Seq("chrom"),
        radius = 100L, binSize = 10L)
      .collect()
      .map(r => (r.getString(2), r.getLong(3), r.getString(4))).toSet
    assert(got == Set(
      ("inside", 0L, "t1"), ("between", 7L, "t1"), ("tie", 8L, "t0"),
      ("far", 100L, "t3"), ("otherchrom", 1L, "t4")), got)
  }

  test("changelog apply: latest op wins — update, insert, delete, " +
    "absent-key delete no-op, untouched pass-through") {
    val s = spark
    import s.implicits._
    val snap = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"),
      (4L, 40.0, "d")).toDF("id", "bal", "seg")
    val changes = Seq(
      (1L, 100L, "U", 11.0, "a2"),  // update key 1
      (1L, 99L, "D", 0.0, "x"),     // superseded by seq 100
      (2L, 50L, "D", 0.0, "x"),     // delete key 2
      (5L, 60L, "I", 55.0, "e"),    // insert unseen key 5
      (6L, 70L, "D", 0.0, "x"))     // delete of absent key: no-op
      .toDF("id", "seq", "op", "bal", "seg")
    val got = graft.operators.TableOps
      .applyChangelog(snap, changes, "id", "op", "seq", Seq("bal", "seg"))
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 11.0, "a2"),  // updated to the LATEST change
      (3L, 30.0, "c"), (4L, 40.0, "d"),  // untouched
      (5L, 55.0, "e")), got)  // inserted; 2 deleted, 6 never existed
  }

  test("time-RANGE frame sums by value distance, not row count") {
    val s = spark
    import s.implicits._
    // user 1: days 0,1,10 — day 10's 7-day window must contain ONLY
    // day 10 (days 0/1 are outside the value range even though they are
    // the 2 preceding ROWS); a burst of same-day rows all join the frame
    val df = Seq((1L, 0L, 10.0), (1L, 1L, 20.0), (1L, 10L, 5.0),
      (2L, 3L, 1.0), (2L, 3L, 2.0), (2L, 8L, 4.0))
      .toDF("uid", "epoch_day", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("uid")).orderBy(col("epoch_day"))
      .rangeBetween(-6, org.apache.spark.sql.expressions.Window.currentRow)
    val got = df.withColumn("s", sum(col("v")).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    assert(got == Set(
      (1L, 0L, 10.0, 10.0), (1L, 1L, 20.0, 30.0),
      (1L, 10L, 5.0, 5.0),          // gap > 6 days: window resets
      (2L, 3L, 1.0, 3.0), (2L, 3L, 2.0, 3.0),  // same-day burst shares
      (2L, 8L, 4.0, 7.0)), got)     // day 3 still in range at day 8
  }

  test("z-order interleave: known values, and z-sorted runs bound both " +
    "dimensions") {
    val s = spark
    import s.implicits._
    // hand-computed Morton values: z(a,b) puts a on even bits, b on odd
    val known = Seq((0L, 0L), (3L, 1L), (1L, 3L), (7L, 7L), (65535L, 0L))
      .toDF("a", "b")
      .select(graft.functions.zorder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // z(3,1)= a bits {0,1}->{0,2}=5, b bit {0}->{1}=2 => 7
    // z(1,3)= a {0}->{0}=1, b {0,1}->{1,3}=10 => 11
    // z(7,7)= 0b111111 = 63; z(65535,0) = even bits set
    assert(known == Seq(0L, 7L, 11L, 63L,
      (0 until 16).map(i => 1L << (2 * i)).sum))
    // locality: on a 64x64 grid, any aligned 256-wide z-range spans at
    // most a 16x16 tile in each dimension (perfect quadtree alignment)
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
      .select(col("x"), col("y"),
        graft.functions.zorder.zValue(col("x"), col("y"), bits = 6)
          .as("z"))
    val spans = grid.groupBy(shiftright(col("z"), 8).as("bucket"))
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .agg(max(col("dx")).as("mdx"), max(col("dy")).as("mdy"))
      .head()
    assert(spans.getLong(0) <= 15 && spans.getLong(1) <= 15, spans)
  }

  test("writeZOrdered: files carry disjoint z-ranges and prune on " +
    "either dimension where a plain sort prunes on one") {
    val s = spark
    import s.implicits._
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y =>
      (x.toLong, y.toLong))).toDF("x", "y")
    val out = s"${sys.props("java.io.tmpdir")}/graft-zorder-spec-" +
      ProcessHandle.current.pid
    graft.functions.zorder.writeZOrdered(grid, out, "x", "y",
      bits = 6, numFiles = 16)
    val z = graft.functions.zorder.zValue(col("x"), col("y"), bits = 6)
    val env = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min(z).as("lo_z"), max(z).as("hi_z"),
        min(col("x")).as("lo_x"), max(col("x")).as("hi_x"),
        min(col("y")).as("lo_y"), max(col("y")).as("hi_y"),
        count(lit(1)).as("n"))
      .collect()
    assert(env.length == 16)
    assert(env.map(_.getLong(7)).sum == 64L * 64)
    // range partitioning: per-file z-intervals are pairwise disjoint
    val sortedByZ = env.sortBy(_.getLong(1))
    sortedByZ.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(2) < b.getLong(1),
        s"overlapping z-ranges: $a vs $b")
    }
    // either-dimension pruning: a point predicate on x (or y) alone
    // touches a strict subset of files by min/max envelope — the gain
    // over sorting by x, where every file spans all of y and only the
    // leading column prunes
    val xHits = env.count(r => r.getLong(3) <= 0 && 0 <= r.getLong(4))
    val yHits = env.count(r => r.getLong(5) <= 0 && 0 <= r.getLong(6))
    assert(xHits <= env.length / 2, s"x pruning weak: $xHits/16")
    assert(yHits <= env.length / 2, s"y pruning weak: $yHits/16")
  }

  test("compactFiles: file count drops to the byte-derived target, " +
    "rows survive exactly, no shuffle in the rewrite") {
    val s = spark
    import s.implicits._
    val in = s"${sys.props("java.io.tmpdir")}/graft-compact-spec-in-" +
      ProcessHandle.current.pid
    val out = s"${sys.props("java.io.tmpdir")}/graft-compact-spec-out-" +
      ProcessHandle.current.pid
    (1L to 4000L).map(i => (i, s"row $i payload ${"x" * 50}"))
      .toDF("id", "payload").repartition(24)
      .write.mode("overwrite").parquet(in)
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts(in) == 24)
    val n = graft.operators.TableOps.compactFiles(spark, in, out,
      targetBytes = 64L << 10)
    assert(parts(out) == n && n < 24 && n >= 1, s"n=$n files=${parts(out)}")
    // content identical
    val a = spark.read.parquet(in).collect().map(_.toString).sorted
    val b = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // the rewrite plan is scan -> coalesce -> write: no exchange
    val plan = spark.read.parquet(in).coalesce(n)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("liftOver: hand-computed remaps — gap positions vanish, minus " +
    "strand reflects, best chain wins by score") {
    val s = spark
    import s.implicits._
    val chains = graft.sources.Chain.read(spark,
      s"${graft.fixtures.GenomicFixtures.rawDir}/lift.chain")
    val points = Seq(
      ("1", 11L, "p1"),      // block 1 start: q0=20 -> new_pos 21
      ("1", 45L, "gap"),     // chain-1 t-gap [40,50): unmapped
      ("X", 21L, "xfirst"),  // q0=10, reflect: 100-1-10=89 -> 90
      ("X", 60L, "xlast"),   // q0=49, reflect -> 51
      ("2", 5L, "nochain"))  // no chain covers chrom 2
      .toDF("chrom", "pos", "id")
    val got = graft.operators.LiftOver.liftOver(points, chains,
      binSize = 16)
      .collect()
      .map(r => r.getString(2) -> (r.getString(3), r.getLong(4),
        r.getString(5), r.getLong(6))).toMap
    assert(got == Map(
      // chain 3 also covers pos 11 (would map to 1_alt:2) but loses on
      // score 500 < 1000
      "p1" -> (("1_new", 21L, "+", 1000L)),
      "xfirst" -> (("X_new", 90L, "-", 800L)),
      "xlast" -> (("X_new", 51L, "-", 800L))), got)
  }

  test("BPE training: hand-computed merge sequence, adjacent-pair " +
    "fixpoint, second-order merges, saturation, vocab round-out") {
    val s = spark
    import s.implicits._
    // words: aa x2 -> " a a ", ab x2 -> " a b ", abab x1, b x1
    val docs = Seq((1L, "aa ab aa ab"), (2L, "abab b"))
      .toDF("doc_id", "text")
    val merges = graft.operators.Tokenizer.bpeTrain(docs, "text", 4)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1)
    // r1: (a,b) counts 2 (ab) + 2 (abab positions 1,3) = 4, beats (a,a)=2
    // r2: abab rewrote to [ab, ab] — the DOUBLE replace: one pass leaves
    //     " ab a b " — so (a,a)=2 wins over (ab,ab)=1
    // r3: only (ab,ab)=1 remains -> second-order merge "abab"
    // r4: saturated — no pairs, no row
    assert(merges.toSeq == Seq(
      (1, "a", "b", "ab", 4L),
      (2, "a", "a", "aa", 2L),
      (3, "ab", "ab", "abab", 1L)), merges.toSeq)
    val vocab = graft.operators.Tokenizer.bpeVocab(docs, "text", 3)
      .collect().map(_.getString(0)).toSet
    assert(vocab == Set("a", "b", "ab", "aa", "abab"))
  }

  test("table stats: exact counts/min/max, HLL NDV within bound, nulls " +
    "counted not hashed") {
    val s = spark
    import s.implicits._
    val df = (1 to 400).map(i => (i.toLong, (i % 7).toDouble))
      .toDF("id", "v")
      .union(Seq((401L, Double.NaN)).toDF("id", "v")
        .select(col("id"), lit(null).cast("double").as("v")))
    val stats = graft.operators.TableOps.tableStats(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))).toMap
    val (idN, idNull, idMin, idMax, idNdv) = stats("id")
    assert((idN, idNull, idMin, idMax) == (401L, 0L, 1.0, 401.0))
    // 256-register HLL on 401 distinct: within ~10%
    assert(math.abs(idNdv - 401) / 401.0 < 0.15, s"ndv=$idNdv")
    val (vN, vNull, vMin, vMax, vNdv) = stats("v")
    assert((vN, vNull, vMin, vMax) == (401L, 1L, 0.0, 6.0))
    // 7 distinct non-null values; small-range linear counting is exact-ish
    assert(vNdv >= 6.5 && vNdv <= 7.5, s"ndv=$vNdv")
  }

  test("windowed peptide index returns exactly the re-join plan's rows") {
    val s = spark
    import s.implicits._
    val prots = Seq(("P1", "MKLVDDAAGTKLV"), ("P2", "KLVKLVKLV"))
      .toDF("accession", "sequence")
    val peps = Seq(("q1", "KLV"), ("q2", "DDAAG"), ("q3", "KLVKLV"),
      ("q4", "XXXX")).toDF("pepId", "peptide")
    def rows(mx: Option[Int]) = graft.operators.PeptideAnnotate
      .matchPeptides(peps, prots, k = 3, maxPeptideLen = mx)
      .collect().map(r => (r.getString(0), r.getString(2), r.getInt(3)))
      .toSet
    val rejoin = rows(None)
    assert(rejoin == rows(Some(8)))
    // overlapping occurrences all found: KLVKLV at P2 pos 1 and 4
    assert(rejoin.contains(("q3", "P2", 1)) && rejoin.contains(("q3", "P2", 4)))
    assert(!rejoin.exists(_._1 == "q4"))
  }

  test("PII cascade: emails consumed before phone/IP patterns") {
    val s = spark
    import s.implicits._
    val df = Seq((1L,
      "mail a.b@c.org or x@10.0.0.5 call +1-555-0100 node 10.1.2.3 end"))
      .toDF("id", "t")
    val r = df.select(text.redactPii(col("t")).as("p")).select(col("p.*"))
      .collect()(0)
    // x@10.0.0.5 is an email (host part matches [A-Za-z0-9.-]+\.[A-Za-z]{2,}?
    // no — TLD must be alphabetic, so it stays and the IP inside is caught)
    assert(r.getString(0) ==
      "mail <EMAIL> or x@<IP> call <PHONE> node <IP> end")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 2)
  }

  test("chunkOverlap: every token covered, stride anchors, short tail") {
    val s = spark
    import s.implicits._
    val doc = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, "  "), (3L, "solo")).toDF("doc_id", "text")
    val out = graft.operators.Packing.chunkOverlap(df, "text",
      size = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3),
        r.getString(4))).toList
    // doc 1: 10 tokens, starts 0,3,6,9 — tail runs short, never re-anchored
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3) == List(4L, 4L, 4L, 1L))
    assert(d1.head._4 == "w1 w2 w3 w4" && d1.last._4 == "w10")
    // overlap: token w4 appears in chunks 0 and 1
    assert(d1(1)._4 == "w4 w5 w6 w7")
    // whitespace-only doc emits nothing; 1-token doc emits one chunk
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L) == List((3L, 0, 1L, "solo")))
  }

  test("vocabTokenStats: greedy longest-match, fallback, truncation, " +
    "empty") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val vocab = Seq(" the", "the", "to", "e", " ")
    val df = Seq(
      (1L, "to the x"), // to|_the|_|x(fb) = 4 tokens, 1 fallback
      (2L, "THE"),      // lower-cased -> the = 1 token
      (3L, "ze"),       // z fallback, e = 2 tokens, 1 fallback
      (4L, ""),         // empty -> 0/0
      (5L, "t"))        // tail probe truncates: no match -> 1 fb token
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      graft.functions.text.vocabTokenStats(col("text"),
        graft.functions.text.vocabMap(vocab), 4).as("s"))
      .select(col("doc_id"), col("s.vocab_tokens"), col("s.fallback_tokens"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == ((4L, 1L)))
    assert(got(2L) == ((1L, 0L)))
    assert(got(3L) == ((2L, 1L)))
    assert(got(4L) == ((0L, 0L)))
    assert(got(5L) == ((1L, 1L)))
  }

  test("shuffleRank is an exact permutation matching the md5 order") {
    val s = spark
    import s.implicits._
    val n = 500
    val df = (0 until n).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .repartition(7)
    val ranked = graft.operators.Sampling.shuffleRank(df, "id", "s1")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exact permutation of 0..n-1
    assert(ranked.values.toSet == (0L until n.toLong).toSet)
    // matches the brute-force single-node md5 sort
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val brute = (0 until n).map(i => i.toLong -> md5hex("s1" + i))
      .sortBy(_._2).zipWithIndex.map { case ((id, _), r) => id -> r.toLong }
      .toMap
    assert(ranked == brute)
    // a different salt draws a different permutation
    val other = graft.operators.Sampling.shuffleRank(df, "id", "s2")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(other != ranked)
  }

  test("statsState merge == single full state, nulls counted, NDV from " +
    "merged registers") {
    val s = spark
    import s.implicits._
    import graft.operators.TableOps
    val full = (1 to 400).map(i =>
      (i.toLong, if (i % 10 == 0) None else Some(i.toDouble % 37)))
      .toDF("k", "v")
    val a = full.where(col("k") <= 150)
    val b = full.where(col("k") > 150)
    def fin(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getDouble(4),
          r.getDouble(5)))).toMap
    val merged = fin(TableOps.statsFinalize(TableOps.mergeStatsStates(
      TableOps.statsState(a, Seq("k", "v")),
      TableOps.statsState(b, Seq("k", "v")))))
    val whole = fin(TableOps.statsFinalize(
      TableOps.statsState(full, Seq("k", "v"))))
    assert(merged == whole, "merge of halves must equal the full state")
    assert(merged("k")._1 == 400L && merged("k")._2 == 0L)
    assert(merged("v")._2 == 40L, "null count")
    assert(merged("k")._3 == 1.0 && merged("k")._4 == 400.0)
    // 37 distinct v values: linear-counting regime, estimate near truth
    assert(math.abs(merged("v")._5 - 37.0) / 37.0 < 0.2)
  }

  test("bfsDepths: shortest hops, frontier stops at maxDepth, " +
    "unreachable absent") {
    val s = spark
    import s.implicits._
    // 0->1->2->3 chain, a shortcut 0->2 (so 2 is depth 1, 3 is depth 2),
    // a cycle edge 3->0 (must not loop), island 9->10 unreachable
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (0L, 2L), (3L, 0L),
      (9L, 10L)).toDF("src", "dst")
    val out = graft.operators.PageRank.bfsDepths(edges, 0L, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
    // depth bound: with maxDepth 1 only the first frontier lands
    val bounded = graft.operators.PageRank.bfsDepths(edges, 0L,
      maxDepth = 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bounded == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("leakageFreeSplit: clusters never straddle splits, fraction near " +
    "target, naive per-doc split WOULD leak") {
    val s = spark
    import s.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again today"
    val docs = ((0 until 60).map(i =>
      (i.toLong, s"unique document number $i talking about topic " +
        s"${"word" * (i % 5 + 1)} and others")) ++
      Seq((100L, dup), (101L, dup + " extra"), (102L, dup + " more")))
      .toDF("doc_id", "text")
    val out = graft.operators.Sampling.leakageFreeSplit(
      docs, "doc_id", "text", testFrac = 0.3, salt = "s7")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.length == 63)
    // the invariant: one split per cluster
    out.groupBy(_._2).values.foreach { members =>
      assert(members.map(_._3).toSet.size == 1,
        s"cluster straddles splits: ${members.toSeq}")
    }
    // the dup trio is one cluster
    val trio = out.filter(t => t._1 >= 100L)
    assert(trio.map(_._2).toSet.size == 1 &&
      trio.map(_._3).toSet.size == 1)
    // fraction lands near the target
    val frac = out.count(_._3 == "test").toDouble / out.length
    assert(frac > 0.05 && frac < 0.6, s"test fraction $frac")
    // contrast: a per-doc draw with the same rule splits the trio with
    // some salt — find one to prove the operator's invariant is doing
    // real work (doc ids differ, so draws differ)
    def draw(salt: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((salt + id).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.take(8), 16)
    }
    val leakySalt = (0 until 50).map("s" + _).find { sa =>
      Seq(100L, 101L, 102L).map(i =>
        draw(sa, i) < 0.3 * 4294967296.0).toSet.size == 2
    }
    assert(leakySalt.nonEmpty,
      "per-doc assignment must split the trio for some salt")
  }

  test("tableDiff classifies added/removed/changed with null-safe " +
    "column lists, drops unchanged") {
    val s = spark
    import s.implicits._
    val before = Seq(
      (1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, Option.empty[Double], "c"), (4L, Some(40.0), "d"))
      .toDF("k", "v", "seg")
    val after = Seq(
      (1L, Some(10.0), "a"),          // unchanged -> dropped
      (2L, Some(21.0), "B"),          // both columns changed
      (3L, Some(30.0), "c"),          // null -> value is a change
      (5L, Some(50.0), "e"))          // added; 4 removed
      .toDF("k", "v", "seg")
    val out = graft.operators.TableOps.tableDiff(before, after,
      Seq("k"), Seq("v", "seg")).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) null else r.getString(2))))
      .toMap
    assert(out == Map(
      2L -> (("changed", "seg;v")),
      3L -> (("changed", "v")),
      4L -> (("removed", null)),
      5L -> (("added", null))))
  }

  test("table checksum: invariant under repartition/row order, moves on " +
    "any mutation; global no-group form works") {
    val s = spark
    import s.implicits._
    val base = (1L to 500L).map(i => (i, s"v${i % 37}", i % 11))
      .toDF("id", "tag", "grp")
    def fp(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TableOps.tableChecksum(df, Seq.empty,
        Seq("id", "tag", "grp")).collect().head.toSeq
    // same multiset, different physical layout -> identical fingerprint
    assert(fp(base) == fp(base.repartition(13).sortWithinPartitions(
      org.apache.spark.sql.functions.col("tag"))))
    // one mutated value -> different fingerprint
    val mutated = base.withColumn("tag",
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.col("id") === 250L,
        org.apache.spark.sql.functions.lit("POISON"))
        .otherwise(org.apache.spark.sql.functions.col("tag")))
    assert(fp(base) != fp(mutated))
    // a row duplicated an EVEN number of times XORs away — the sum and
    // count folds are what still move (the documented blind-spot cover)
    val doubled = base.unionAll(base.where(
      org.apache.spark.sql.functions.col("id") === 7L))
      .unionAll(base.where(org.apache.spark.sql.functions.col("id") === 7L))
    val (b, d) = (fp(base), fp(doubled))
    assert(b(1) == d(1) && b(2) == d(2), "xor folds cancel as expected")
    assert(b(0) != d(0) && b(3) != d(3), "count+sum catch it")
  }

  test("host policy apply keeps exactly the kept hosts' docs") {
    val s = spark
    import s.implicits._
    val docs = (1L to 120L).map(i =>
      (i, s"h${i % 4}.ex.com", if (i % 4 == 0) "en" else "de",
        100L + i % 5, "src")).toDF("doc_id", "host", "lang", "n_chars",
      "source")
    val pol = graft.operators.WebStats.hostPolicy(docs, "host", "lang",
      "n_chars", "source", minDocs = 3, minMeanChars = 50.0,
      minLangShare = 0.9)
    val keptHosts = pol.where(org.apache.spark.sql.functions.col("keep"))
      .collect().map(_.getString(0)).toSet
    assert(keptHosts == Set("h0.ex.com"), "only the all-en host survives")
    val kept = graft.operators.WebStats.applyPolicy(docs, pol, "host")
    assert(kept.select("host").distinct().collect()
      .map(_.getString(0)).toSet == keptHosts)
    assert(kept.count() == docs.where(
      org.apache.spark.sql.functions.col("host").isin(
        keptHosts.toSeq: _*)).count())
  }

  test("langIdNgram beats the t3 stopword heuristic on a labeled " +
    "fixture; non-Latin scripts and gibberish route to und") {
    val s = spark
    import s.implicits._
    // hand-written sentences (NOT from the UDHR seed texts), 7 per
    // language including two short ones, plus 4 und cases
    val fixture: Seq[(String, String)] = Seq(
      "en" -> "She walked slowly through the quiet garden while the children played outside",
      "en" -> "Where did you put the keys this morning",
      "en" -> "The weather has been terrible all week",
      "en" -> "I would like a cup of coffee please",
      "en" -> "He reads the newspaper every morning before work",
      "en" -> "Thank you very much",
      "en" -> "The train leaves at seven",
      "de" -> "Sie ging langsam durch den stillen Garten während die Kinder draußen spielten",
      "de" -> "Wo hast du die Schlüssel heute Morgen hingelegt",
      "de" -> "Das Wetter war die ganze Woche schrecklich",
      "de" -> "Ich hätte gerne eine Tasse Kaffee bitte",
      "de" -> "Er liest jeden Morgen die Zeitung vor der Arbeit",
      "de" -> "Vielen herzlichen Dank",
      "de" -> "Der Zug fährt um sieben",
      "es" -> "Ella caminaba despacio por el jardín tranquilo mientras los niños jugaban afuera",
      "es" -> "Dónde pusiste las llaves esta mañana",
      "es" -> "El tiempo ha sido terrible toda la semana",
      "es" -> "Quisiera una taza de café por favor",
      "es" -> "Él lee el periódico cada mañana antes del trabajo",
      "es" -> "Muchas gracias por todo",
      "es" -> "El tren sale a las siete",
      "fr" -> "Elle marchait lentement dans le jardin calme pendant que les enfants jouaient dehors",
      "fr" -> "Où as tu mis les clés ce matin",
      "fr" -> "Le temps a été terrible toute la semaine",
      "fr" -> "Je voudrais une tasse de café s il vous plaît",
      "fr" -> "Il lit le journal chaque matin avant le travail",
      "fr" -> "Merci beaucoup pour tout",
      "fr" -> "Le train part à sept heures",
      "it" -> "Lei camminava lentamente nel giardino tranquillo mentre i bambini giocavano fuori",
      "it" -> "Dove hai messo le chiavi questa mattina",
      "it" -> "Il tempo è stato terribile tutta la settimana",
      "it" -> "Vorrei una tazza di caffè per favore",
      "it" -> "Lui legge il giornale ogni mattina prima del lavoro",
      "it" -> "Grazie mille di tutto",
      "it" -> "Il treno parte alle sette",
      "nl" -> "Zij liep langzaam door de stille tuin terwijl de kinderen buiten speelden",
      "nl" -> "Waar heb je de sleutels vanochtend gelegd",
      "nl" -> "Het weer was de hele week verschrikkelijk",
      "nl" -> "Ik wil graag een kopje koffie alstublieft",
      "nl" -> "Hij leest elke ochtend de krant voor het werk",
      "nl" -> "Dank je wel voor alles",
      "nl" -> "De trein vertrekt om zeven uur",
      "pt" -> "Ela caminhava devagar pelo jardim tranquilo enquanto as crianças brincavam lá fora",
      "pt" -> "Onde você colocou as chaves esta manhã",
      "pt" -> "O tempo tem estado terrível a semana toda",
      "pt" -> "Eu gostaria de uma xícara de café por favor",
      "pt" -> "Ele lê o jornal todas as manhãs antes do trabalho",
      "pt" -> "Muito obrigado por tudo",
      "pt" -> "O trem sai às sete",
      "und" -> "Все люди рождаются свободными и равными в своем достоинстве",
      "und" -> "天下无难事只怕有心人",
      "und" -> "1234 5678 9012 3456",
      "und" -> "!!! ??? ... ###")
    val df = fixture.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("id", "label", "text")
    val pred = df
      .select(col("id"), col("label"),
        text.langGrams(col("text")).as("gs"))
      .select(col("id") +: col("label") +:
        text.langNgramScores(col("gs"))
          .map { case (l, d) => d.as(s"s_$l") }: _*)
      .select(col("id"), col("label"),
        text.langNgramPick(
          text.langSeeds.map(_._1).map(l => l -> col(s"s_$l")))
          .as("ngram_pred"))
      .join(df.select(col("id"),
        text.langId(col("text")).as("stop_pred")), Seq("id"))
      .collect()
    val n = pred.length
    val accNgram = pred.count(r => r.getString(2) == r.getString(1)).toDouble / n
    val accStop = pred.count(r => r.getString(3) == r.getString(1)).toDouble / n
    info(f"labeled fixture n=$n: langIdNgram acc=$accNgram%.3f, " +
      f"t3 stopword acc=$accStop%.3f")
    pred.filter(r => r.getString(2) != r.getString(1)).foreach(r =>
      info(s"ngram miss: label=${r.getString(1)} pred=${r.getString(2)}"))
    // every und case must route to und (no coin-flip on unseen scripts)
    pred.filter(_.getString(1) == "und").foreach(r =>
      assert(r.getString(2) == "und", s"und case predicted ${r.getString(2)}"))
    assert(accNgram > accStop,
      f"ngram $accNgram%.3f must beat stopword $accStop%.3f")
    assert(accNgram >= 0.90, f"ngram accuracy $accNgram%.3f below 0.90")
  }

  test("Fastq.write refuses null fields loudly") {
    val s = spark
    import s.implicits._
    val bad = Seq((0L, "r1", Option.empty[String], "ACGT",
      null.asInstanceOf[String])).toDF("rec", "read_id", "description",
      "sequence", "quality")
    val out = java.nio.file.Files.createTempDirectory("graft-fq").toString
    val e = intercept[Exception] {
      graft.sources.Fastq.write(bad, s"$out/x")
    }
    assert(e.getMessage != null)
  }
}
