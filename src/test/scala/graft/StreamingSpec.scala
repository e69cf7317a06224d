package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.streaming.Events

/** Structured Streaming variants exercised with MemoryStream sources and
  * memory sinks: watermarked tumbling windows and in-watermark dedup.
  */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("streaming-test")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("streaming tumbling window aggregates with watermark") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = Events.tumblingAggStream(events, "10 minutes", "20 minutes")
      .writeStream.format("memory").queryName("win")
      .outputMode("update").start()
    mem.addData((ts(1), "click", 1.0), (ts(5), "click", 2.0),
      (ts(12), "view", 5.0))
    q.processAllAvailable()
    val rows = spark.table("win").collect()
    q.stop()
    assert(rows.exists(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[Long]("n_events") == 2L))
    assert(rows.exists(r => r.getAs[String]("event_type") == "view" &&
      r.getAs[Double]("sum_value") == 5.0))
  }

  test("stateful sessionization closes a session when the gap is exceeded") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")

    val q = Events.sessionizeStream(events, gapMinutes = 30, "10 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 7: two events 4 min apart, then one 50 min later -> the first
    // session closes the moment the late event arrives
    mem.addData((7L, ts(1), 1.0), (7L, ts(5), 2.0))
    q.processAllAvailable()
    mem.addData((7L, ts(55), 4.0))
    q.processAllAvailable()
    val rows = spark.table("sessions").collect()
    q.stop()
    assert(rows.length == 1, rows.mkString(";"))
    val s = rows(0)
    assert(s.getAs[Long]("user_id") == 7L)
    assert(s.getAs[Timestamp]("session_start") == ts(1))
    assert(s.getAs[Timestamp]("session_end") == ts(5))
    assert(s.getAs[Long]("n_events") == 2L)
    assert(s.getAs[Double]("sum_value") == 3.0)
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type")

    val q = Events.dedupStream(events, "1 hour")
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    mem.addData((1L, ts(1), "a"), (1L, ts(2), "a-dup"), (2L, ts(3), "b"))
    q.processAllAvailable()
    val n = spark.table("dedup").count()
    q.stop()
    assert(n == 2L) // the second event_id=1 is dropped
  }

  test("stateless stream sampling == batch draw, stable across batches") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("event_id", "ts", "event_type")
    val q = Events.sampleEvents(events, rate = 0.35, salt = "sx")
      .writeStream.format("memory").queryName("sampled")
      .outputMode("append").start()
    val rows = (1L to 40L).map(i => (i, ts((i % 50).toInt), s"t${i % 3}"))
    mem.addData(rows.take(25): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(25): _*)
    q.processAllAvailable()
    val got = spark.table("sampled").select("event_id").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    val batch = Events.sampleEvents(
      rows.toDF("event_id", "ts", "event_type"), rate = 0.35, salt = "sx")
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == batch && got.nonEmpty && got.size < 40)
  }

  test("streaming checksum state equals the batch fingerprint after " +
    "every micro-batch") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Long, String)]
    val events = mem.toDF().toDF("event_id", "user_id", "event_type")
    val q = Events.checksumStream(events, Seq("event_type"),
      Seq("event_id", "user_id", "event_type"))
      .writeStream.format("memory").queryName("cksum")
      .outputMode("complete").start()
    val all = (1L to 30L).map(i => (i, i % 7, s"t${i % 2}"))
    def snap() = spark.table("cksum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    def batchOf(n: Int) = graft.operators.TableOps.tableChecksum(
      all.take(n).toDF("event_id", "user_id", "event_type"),
      Seq("event_type"), Seq("event_id", "user_id", "event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    mem.addData(all.take(12): _*)
    q.processAllAvailable()
    assert(snap() == batchOf(12))
    mem.addData(all.drop(12): _*)
    q.processAllAvailable()
    assert(snap() == batchOf(30))
    q.stop()
  }

  test("streaming k-means: ordered micro-batch slices == the batch fold, " +
    "separated clusters recovered") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    // three tight, well-separated 4-d clusters around distinct corners
    val centers = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(10.0, 10.0, 0.0, 0.0),
      Seq(0.0, 0.0, 10.0, 10.0))
    val rows = (0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      val jit = 0.01 * ((i * 37 % 11) - 5)
      (0L, i, c.map(_ + jit))
    }
    val mem = MemoryStream[(Long, Long, Seq[Double])]
    val vecs = mem.toDF().toDF("group", "vec_id", "embedding")
    val q = graft.streaming.StreamKmeans.kmeansStream(vecs, k = 3)
      .toDF("group", "state")
      .writeStream.format("memory").queryName("km")
      .outputMode("update").start()
    mem.addData(rows.take(30): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(30): _*)
    q.processAllAvailable()
    val got = spark.table("km").orderBy(org.apache.spark.sql.functions
      .col("group")).collect().last.getStruct(1)
    q.stop()
    val batch = graft.streaming.StreamKmeans.kmeansStream(
      rows.toDF("group", "vec_id", "embedding"), k = 3)
      .collect().head._2
    // bit-equal state: stream over ordered slices == one batch fold
    assert(got.getSeq[Seq[Double]](0) == batch.cents)
    assert(got.getSeq[Long](1) == batch.ns)
    // the three centroids sit on the three true centers (within jitter)
    val recovered = batch.cents.map(c =>
      centers.indexWhere(t => t.zip(c).map { case (a, b) =>
        math.abs(a - b) }.max < 0.2))
    assert(recovered.toSet == Set(0, 1, 2))
    assert(batch.ns.sum == 60L && batch.ns.forall(_ == 20L))
  }

  test("welford state over ordered micro-batch slices == the batch fold, " +
    "bit-equal; hand-case variance exact") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val ev = mem.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = Events.welfordStream(ev)
      .toDF("user_id", "n_events", "mean", "variance")
      .writeStream.format("memory").queryName("welford")
      .outputMode("update").start()
    val rows = (1L to 20L).map(i =>
      (i % 3, ts((i % 50).toInt), i, (i * 7 % 13).toDouble))
    mem.addData(rows.take(11): _*)
    q.processAllAvailable()
    mem.addData(rows.drop(11): _*)
    q.processAllAvailable()
    // update mode re-emits per trigger: keep the last row per user
    val got = spark.table("welford")
      .withColumn("_r", org.apache.spark.sql.functions.monotonically_increasing_id())
      .orderBy(org.apache.spark.sql.functions.col("_r").desc)
      .dropDuplicates("user_id")
      .select("user_id", "n_events", "mean", "variance").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    q.stop()
    val batch = Events.welfordStream(
      rows.toDF("user_id", "ts", "event_id", "value"))
      .collect().map(o =>
        (o.user_id, (o.n_events, o.mean, o.variance.get))).toMap
    assert(got == batch) // bit-equal doubles, not approx
    // hand case: values 1,2,3 -> mean 2, sample variance 1
    val h = Events.welfordStream(Seq(
      (9L, ts(1), 1L, 1.0), (9L, ts(2), 2L, 2.0), (9L, ts(3), 3L, 3.0))
      .toDF("user_id", "ts", "event_id", "value")).collect().head
    assert(h.mean == 2.0 && h.variance.contains(1.0))
  }

  test("stream-static enrichment joins the broadcast dimension per event") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val dim = Seq((1L, "EU"), (2L, "US")).toDF("user_id", "region")
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val events = mem.toDF().toDF("event_id", "user_id", "ts")

    val q = Events.enrich(events, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    mem.addData((10L, 1L, ts(1)), (11L, 2L, ts(2)), (12L, 9L, ts(3)))
    q.processAllAvailable()
    val rows = spark.table("enriched")
      .select("event_id", "region").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    q.stop()
    // unknown user 9 keeps its event with a null region (left join)
    assert(rows == Set((10L, Some("EU")), (11L, Some("US")), (12L, None)))
  }

  test("watermarked stream-stream interval join attributes within horizon") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val views = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    def shape(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
        .withWatermark("ts", "1 hour")

    val q = Events.correlate(shape(views), shape(buys), "user_id",
      horizonMinutes = 30)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    // user 1: view@1 -> buy@11 (in horizon); user 2: view@2 -> buy@52
    // (outside 30 min); user 3: buy@5 with no prior view
    views.addData((1L, 100L, ts(1)), (2L, 101L, ts(2)))
    buys.addData((1L, 200L, ts(11)), (2L, 201L, ts(52)), (3L, 202L, ts(5)))
    q.processAllAvailable()
    val rows = spark.table("attrib")
      .select("cause_id", "effect_id", "delay_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    q.stop()
    assert(rows == Set((100L, 200L, 600000000L)))
  }

  test("outer stream-stream join emits unmatched causes after watermark") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val views = MemoryStream[(Long, Long, Timestamp)]
    val buys = MemoryStream[(Long, Long, Timestamp)]
    def shape(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF().toDF("user_id", "event_id", "ts")
        .withWatermark("ts", "10 minutes")

    val q = Events.correlateOuter(shape(views), shape(buys), "user_id",
      horizonMinutes = 30)
      .writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()
    // user 1 converts in horizon; user 2's view never converts
    views.addData((1L, 100L, ts(1)), (2L, 101L, ts(2)))
    buys.addData((1L, 200L, ts(11)))
    q.processAllAvailable()
    def rows() = spark.table("attrib_outer")
      .select("cause_id", "effect_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    // before the watermark passes view@2's horizon, the unmatched row
    // must NOT have been emitted — a buy could still arrive
    assert(rows() == Set((100L, 200L)))
    // advance both watermarks far past ts(2)+30min: the null-effect row
    // for user 2 is now safe to emit
    views.addData((9L, 900L, ts(300)))
    buys.addData((9L, 901L, ts(300)))
    q.processAllAvailable()
    q.processAllAvailable()
    assert(rows().contains((101L, -1L)))
    q.stop()
  }

  test("streaming funnel advances stages across micro-batches in order") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, String)]
    val events = mem.toDF().toDF("user_id", "ts", "event_type")
    val q = graft.streaming.Events.funnelStream(events)
      .writeStream.format("memory").queryName("funnel")
      .outputMode("update").start()
    // batch 1: u1 view->click, u2 click-without-view, u3 view
    mem.addData((1L, ts(1), "view"), (1L, ts(2), "click"),
      (2L, ts(1), "click"), (3L, ts(4), "view"))
    q.processAllAvailable()
    // batch 2: u1 completes; u2's late view starts the funnel; u3 tries
    // to purchase without a click — must stay at 'view'
    mem.addData((1L, ts(3), "purchase"), (2L, ts(5), "view"),
      (3L, ts(6), "purchase"))
    q.processAllAvailable()
    val last = spark.table("funnel").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) =>
        u -> rows.last.getString(1)
      }
    q.stop()
    assert(last(1L) == "view_click_purchase")
    assert(last(2L) == "view")
    assert(last(3L) == "view")
  }

  test("streaming HLL registers merge across micro-batches to the batch" +
    " answer") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(String, Long)]
    val events = mem.toDF().toDF("g", "v")
    val q = graft.streaming.StreamSketches
      .hllDistinctStream(events, "g", "v")
      .writeStream.format("memory").queryName("hll")
      .outputMode("update").start()
    // two micro-batches with overlapping values: merged registers must
    // equal one batch pass over the union
    mem.addData((1 to 400).map(i => ("a", i.toLong)): _*)
    q.processAllAvailable()
    mem.addData((200 to 600).map(i => ("a", i.toLong)): _*)
    q.processAllAvailable()
    val streamed = spark.table("hll").collect()
      .filter(_.getString(0) == "a").map(_.getDouble(1)).last
    q.stop()
    val batch = graft.operators.Sketches.hllDistinct(
      (1 to 600).map(i => ("a", i.toLong)).toDF("g", "v"), Seq("g"), "v")
      .collect()(0).getDouble(1)
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("streaming CMS counters sum across micro-batches to the batch matrix") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[Long]
    val events = mem.toDF().toDF("user_id")
    val q = graft.streaming.StreamSketches
      .cmsStream(events, "user_id")
      .writeStream.format("memory").queryName("cms")
      .outputMode("update").start()
    // two micro-batches with overlapping values: summed counters must
    // equal one batch pass over the union, cell for cell
    mem.addData((1 to 300).map(_.toLong % 40): _*)
    q.processAllAvailable()
    mem.addData((150 to 500).map(_.toLong % 40): _*)
    q.processAllAvailable()
    // update mode re-emits a cell each time it changes: the LAST row per
    // cell is its final state
    val streamed = spark.table("cms").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }
    q.stop()
    val batch = graft.streaming.StreamSketches
      .cmsStream((1 to 300).map(_.toLong % 40)
        .++((150 to 500).map(_.toLong % 40)).toDF("user_id"), "user_id")
      .collect().map(c => ((c.row, c.bucket), c.cms_count)).toMap
    assert(streamed.toMap == batch)
    assert(batch.values.sum == 4L * (300 + 351)) // every event hits 4 rows
  }

  test("streaming upsert: late low-seq changes lose, deletes tombstone, " +
    "final state equals the batch compaction of the full changelog") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Long, String, Double)]
    val changes = mem.toDF().toDF("k", "seq", "op", "v")
    val q = graft.streaming.Upsert.upsertStream(changes, "k", "seq",
      "op", "v")
      .writeStream.format("memory").queryName("ups")
      .outputMode("update").start()
    val batch1 = Seq((1L, 5L, "U", 1.0), (2L, 1L, "U", 2.0))
    // batch 2: key 1 gets a LATE change with a LOWER seq (must lose to
    // the already-applied seq 5), key 2 is deleted, key 3 is new
    val batch2 = Seq((1L, 3L, "U", 9.9), (2L, 7L, "D", 0.0),
      (3L, 2L, "U", 4.2))
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    val finalRows = spark.table("ups").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2),
        r.getDouble(3))))
      .groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }
    q.stop()
    assert(finalRows(1L) == ((5L, "U", 1.0)), finalRows) // late 3 lost
    assert(finalRows(2L) == ((7L, "D", 0.0)), finalRows) // tombstone
    assert(finalRows(3L) == ((2L, "U", 4.2)), finalRows)
    // stream == batch: one pass over the union produces the same rows
    val batch = graft.streaming.Upsert.upsertStream(
      (batch1 ++ batch2).toDF("k", "seq", "op", "v"),
      "k", "seq", "op", "v")
      .collect().map(o => (o.key, (o.seq, o.op, o.value))).toMap
    assert(finalRows.toMap == batch)
  }

  test("streaming histogram cells sum across micro-batches to the batch" +
    " counts") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(String, Double)]
    val events = mem.toDF().toDF("g", "v")
    val q = graft.streaming.StreamSketches
      .histStream(events, "g", "v", binWidth = 10.0)
      .writeStream.format("memory").queryName("hist")
      .outputMode("update").start()
    mem.addData((1 to 200).map(i => ("a", i * 0.7)): _*)
    q.processAllAvailable()
    mem.addData((100 to 300).map(i => ("a", i * 0.7)): _*)
    q.processAllAvailable()
    val streamed = spark.table("hist").collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, vs) => (k, vs.last._2) }
    q.stop()
    val batch = ((1 to 200) ++ (100 to 300)).map(i => ("a", i * 0.7))
      .toDF("g", "v")
      .groupBy(org.apache.spark.sql.functions.col("g"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("v") / 10.0).as("b")).count()
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
      .toMap
    assert(streamed.toMap == batch)
  }

  test("streaming ingest dedup equals the batch run across micro-batches") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    // indexed corpus: two docs near-dup of incoming ones, one unrelated
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "pack my box with five dozen quality liquor jugs now"),
      (3L, "completely unrelated text about gardening and soil care"))
      .toDF("doc_id", "text")
    // pre-capped at "index build": what production persists for ingest
    val idx = graft.operators.Dedup.capIndex(graft.operators.Dedup
      .minhashBuckets(corpus, "doc_id", "text")).localCheckpoint()
    val arriving = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "pack my box with five dozen quality liquor jugs here"),
      (12L, "nothing like anything the corpus has ever seen before"))
    val mem = MemoryStream[(Long, String, Timestamp)]
    val stream = mem.toDF().toDF("doc_id", "text", "ts")
    // watermarked form: band-collision dedup state is bounded instead of
    // growing with every pair ever seen (batch gate callers pass None)
    val q = graft.streaming.StreamDedup
      .ingestDedup(stream, corpus, idx, "doc_id", "text",
        jaccardThreshold = 0.3, watermark = Some(("ts", "10 minutes")))
      .writeStream.format("memory").queryName("ingest")
      .outputMode("append").start()
    // split arrivals across two micro-batches
    val timed = arriving.zipWithIndex.map { case ((id, t), i) =>
      (id, t, ts(i + 1)) }
    mem.addData(timed.take(1): _*)
    q.processAllAvailable()
    mem.addData(timed.drop(1): _*)
    q.processAllAvailable()
    val streamed = spark.table("ingest").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    val batch = graft.streaming.StreamDedup
      .ingestDedup(arriving.toDF("doc_id", "text"), corpus, idx,
        "doc_id", "text", jaccardThreshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch.map(_._1) == Set(10L, 11L)) // 12 matches nothing
    assert(batch.map(_._2) == Set(1L, 2L))   // 3 is never a dup target
  }

  test("streaming IVF coarse assignment equals batch across micro-batches") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    def v(seed: Int): Seq[Double] =
      (0 until 8).map(d => math.sin(seed * 31 + d * 7))
    val codebook = Seq((0L, v(100)), (1L, v(200)), (2L, v(300)))
      .toDF("centId", "centVec")
    val vecs = (1 to 12).map(i => (i.toLong, v(i)))
    val mem = MemoryStream[(Long, Seq[Double])]
    val stream = mem.toDF().toDF("cid", "cvec")
    val q = graft.operators.Similarity
      .coarseAssignRowwise(stream, codebook)
      .writeStream.format("memory").queryName("assign_stream")
      .outputMode("append").start()
    mem.addData(vecs.take(5): _*)
    q.processAllAvailable()
    mem.addData(vecs.drop(5): _*)
    q.processAllAvailable()
    val streamed = ss.table("assign_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    val batch = graft.operators.Similarity
      .coarseAssignRowwise(vecs.toDF("cid", "cvec"), codebook)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    assert(batch.size == 12 && batch.map(_._2).subsetOf(Set(0L, 1L, 2L)))
  }

  test("streaming space-saving top-k equals batch counts across " +
    "micro-batches when capacity covers the key domain") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[Long]
    val events = mem.toDF().toDF("user_id")
    val q = graft.streaming.StreamSketches
      .spaceSavingStream(events, "user_id", capacity = 100, shards = 4)
      .writeStream.format("memory").queryName("sstopk")
      .outputMode("update").start()
    val batch1 = Seq(1L, 1L, 2L, 3L, 1L)
    val batch2 = Seq(2L, 4L, 1L, 4L, 4L, 4L)
    mem.addData(batch1: _*)
    q.processAllAvailable()
    mem.addData(batch2: _*)
    q.processAllAvailable()
    // update-mode sink accumulates one row per touched entry per trigger;
    // counts only grow in exact mode, so latest = max per value
    val streamed = ss.table("sstopk")
      .groupBy("value").agg(org.apache.spark.sql.functions.max("ss_count")
        .as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    val truth = (batch1 ++ batch2).groupBy(identity)
      .map { case (v, occ) => v.toString -> occ.size.toLong }
    assert(streamed == truth, s"stream=$streamed truth=$truth")
    assert(ss.table("sstopk")
      .where(org.apache.spark.sql.functions.col("ss_err") =!= 0)
      .count() == 0)
  }

  test("space-saving eviction keeps the guarantee: bounded entries, " +
    "heavy values present, counts bracket truth") {
    val ss = spark
    import ss.implicits._
    // one shard, capacity 3, 6 distinct values — eviction must fire
    // (batch execution drives the same flatMapGroupsWithState path in a
    // single state pass)
    val vals = Seq.fill(40)("heavy") ++ Seq.fill(9)("mid") ++
      Seq("a", "b", "c", "d")
    val out = graft.streaming.StreamSketches
      .spaceSavingStream(vals.toDF("user_id"), "user_id",
        capacity = 3, shards = 1)
      .collect()
    val truth = vals.groupBy(identity).map { case (v, o) =>
      v -> o.size.toLong }
    assert(out.length <= 3, out.mkString(";"))
    // space-saving guarantee: any value with true count > N/capacity
    // survives every eviction
    assert(out.exists(_.value == "heavy"))
    assert(out.exists(_.value == "mid"),
      s"mid count ${truth("mid")} > ${vals.size}/3 must be present")
    out.foreach { cand =>
      val t = truth.getOrElse(cand.value, 0L)
      assert(t <= cand.ss_count,
        s"${cand.value}: ss_count ${cand.ss_count} must overestimate $t")
      assert(cand.ss_count - cand.ss_err <= t,
        s"${cand.value}: lower bound must not exceed truth $t")
    }
  }

  test("events adapter normalizes every parquet ts encoding the driver " +
    "has shipped (NTZ micros, nanos-as-long, UTC micros)") {
    // The r8 driver regenerated events.parquet as TIMESTAMP_MICROS
    // isAdjustedToUTC=false (Spark: TimestampNTZType) and every
    // unix_micros path broke AT THE GATE, not in a unit test. This pins
    // all three encodings through the Streaming.events adapter and the
    // four operators that broke (sessionize / correlate / correlateOuter
    // / funnelStream), so the next re-encode fails here first.
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("evts_enc").toString
    val canon = Seq(
      (1L, "2024-01-01 10:01:00", 10L, "view", 1.0),
      (2L, "2024-01-01 10:05:00", 10L, "purchase", 2.0),
      (3L, "2024-01-01 11:30:00", 10L, "view", 3.0),
      (4L, "2024-01-01 10:02:00", 20L, "view", 4.0),
      (5L, "2024-01-01 10:20:00", 20L, "click", 5.0),
      (6L, "2024-01-01 10:40:00", 20L, "purchase", 6.0))
      .toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    // (a) UTC-adjusted micros (TimestampType — adapter must no-op)
    canon.write.mode("overwrite").parquet(s"$tmp/utc")
    // (b) local-semantics micros, isAdjustedToUTC=false (the r8 break)
    canon.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$tmp/ntz")
    // (c) nanos-as-long: what TIMESTAMP(NANOS) parquet becomes under
    // spark.sql.legacy.parquet.nanosAsLong=true (the pre-r8 encoding)
    canon.withColumn("ts", unix_micros(col("ts")) * 1000L)
      .write.mode("overwrite").parquet(s"$tmp/longns")

    def fingerprint(dir: String): Seq[String] = {
      val ev = graft.queries.Streaming.normalizeTs(ss.read.parquet(dir))
      assert(ev.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampType, s"$dir: ${ev.schema}")
      val views = ev.where(col("event_type") === "view")
      val buys = ev.where(col("event_type") === "purchase")
      (Events.sessionize(ev, gapMinutes = 30).collect() ++
        Events.tumblingAgg(ev, "hour").collect() ++
        Events.correlate(views, buys, "user_id", 30).collect() ++
        Events.correlateOuter(views, buys, "user_id", 30).collect() ++
        Events.funnelStream(ev).collect())
        .map(_.toString).sorted.toSeq
    }

    val ref = fingerprint(s"$tmp/utc")
    assert(ref.nonEmpty)
    assert(fingerprint(s"$tmp/ntz") == ref)
    assert(fingerprint(s"$tmp/longns") == ref)

    // Streaming variant over the NEW (NTZ) file encoding: a readStream
    // from the driver-shaped parquet, normalized by the same adapter,
    // must emit exactly the batch sessionize's CLOSED sessions (the
    // still-open tail session per user is unemittable by construction).
    import org.apache.spark.sql.types._
    val ntzSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("ts", TimestampNTZType)))
    val stream = graft.queries.Streaming.normalizeTs(
      ss.readStream.schema(ntzSchema).parquet(s"$tmp/ntz"))
    val q = Events.sessionizeStream(stream, gapMinutes = 30, "10 minutes")
      .writeStream.format("memory").queryName("sessions_ntz")
      .outputMode("append").start()
    q.processAllAvailable()
    val streamed = ss.table("sessions_ntz").collect()
      .map(_.toString).sorted.toSeq
    q.stop()
    val ntzEvents =
      graft.queries.Streaming.normalizeTs(ss.read.parquet(s"$tmp/ntz"))
    val batchAll = Events.sessionize(ntzEvents, gapMinutes = 30)
    // a session is EMITTED if a later event of the same user opened a new
    // session (gap-exceed: every non-latest session) OR the event-time
    // timeout fired (final watermark = max ts - 10 min passed end + gap)
    val wmMs = ntzEvents.agg(max(unix_micros(col("ts")))).head.getLong(0)
      ./(1000L) - 10L * 60 * 1000
    val closed = batchAll
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("session_start").desc)))
      .where(col("_rk") > 1 ||
        unix_micros(col("session_end")) / 1000L + 30L * 60 * 1000 < wmMs)
      .drop("_rk")
      .select("user_id", "session_start", "session_end", "n_events",
        "sum_value")
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == closed, s"stream=$streamed closed=$closed")
    assert(streamed.nonEmpty)
  }

  test("streaming EWMA equals one batch fold when slices arrive in order") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp, Long, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "event_id", "value")
    val q = graft.streaming.Events.ewmaStream(events, alpha = 0.3)
      .writeStream.format("memory").queryName("ewma")
      .outputMode("update").start()
    def t(i: Int) = new Timestamp(1700000000000L + i * 60000L)
    val all = (1 to 30).map(i =>
      (1L, t(i), i.toLong, if (i == 17) 900.0 else 10.0 + i))
    // three time-ordered slices (the operator's across-batch contract)
    all.grouped(10).foreach { slice =>
      mem.addData(slice: _*)
      q.processAllAvailable()
    }
    val streamed = spark.table("ewma").collect()
      .filter(_.getLong(0) == 1L).last
    q.stop()
    // brute-force left fold over the full ordered history
    var acc = all.head._4
    all.tail.foreach { e => acc = (1 - 0.3) * acc + 0.3 * e._4 }
    assert(streamed.getLong(1) == 30L)
    assert(streamed.getDouble(2) == acc,
      s"stream=${streamed.getDouble(2)} batch=$acc")
    // the spike at i=17 is visible: ewma right before vs right after
    val rows = spark.table("ewma").collect().filter(_.getLong(0) == 1L)
    assert(rows.length == 3, "one update row per micro-batch")
  }

  test("gap alerts fire on event-time timeout for the silent key only, " +
    "and a late event re-arms monitoring") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = graft.streaming.Events
      .gapAlertStream(events, gapSeconds = 60, watermark = "0 seconds")
      .writeStream.format("memory").queryName("gaps")
      .outputMode("append").start()
    def t(sec: Int) = new Timestamp(1700000000000L + sec * 1000L)
    // both users alive at t0; user 2 keeps sending, user 1 goes silent
    mem.addData((1L, t(0)), (2L, t(0)))
    q.processAllAvailable()
    mem.addData((2L, t(30)), (2L, t(65)))
    q.processAllAvailable()
    // watermark passes t(0)+60s once max event time reaches t(65):
    // user 1's timeout fires; user 2 was re-armed by its later events
    mem.addData((2L, t(130)))
    q.processAllAvailable()
    mem.addData((2L, t(200)))
    q.processAllAvailable()
    val alerts = spark.table("gaps").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    q.stop()
    assert(alerts.count(_._1 == 1L) == 1,
      s"exactly one alert for the silent user: ${alerts.toSeq}")
    assert(alerts.filter(_._1 == 1L).head._2 == t(0).getTime)
    // user 2's last event is within its own 60s deadline at the final
    // watermark (200-60=140 < ... its last event 200) -> no alert
    assert(!alerts.exists(a => a._1 == 2L && a._2 < t(65).getTime),
      s"active user must not alert while active: ${alerts.toSeq}")
  }

  test("streaming bloom admission: stateless append stream == batch, " +
    "duplicates flagged across micro-batch boundaries") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    val corpus = Seq("alpha beta", "gamma delta", "epsilon zeta")
      .toDF("text")
    val bits = graft.operators.BloomJoin.buildBits(
      corpus.select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("text")).as("h")).distinct(),
      "h", bits = 4096, hashes = 3).localCheckpoint()
    val all = Seq((1L, "alpha beta"), (2L, "fresh one"),
      (3L, "gamma delta"), (4L, "fresh two"))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Dedup.bloomAdmit(
      mem.toDF().toDF("doc_id", "text"), bits, "doc_id", "text",
      bits = 4096)
      .writeStream.format("memory").queryName("admit")
      .outputMode("append").start()
    mem.addData(all.take(2): _*)
    q.processAllAvailable()
    mem.addData(all.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("admit").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val batch = graft.operators.Dedup.bloomAdmit(
      all.toDF("doc_id", "text"), bits, "doc_id", "text", bits = 4096)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == batch, s"stream $got != batch $batch")
    assert(got(1L) && got(3L), "corpus texts must be admitted as hits")
    q.stop()
  }

  test("streaming DSIR admission scoring: stateless append stream == " +
    "batch bit-for-bit across micro-batch boundaries") {
    val ss = spark
    implicit val sqlCtx = ss.sqlContext
    import ss.implicits._
    // fit the ratio table on a tiny pool where 'en-ish' docs are the
    // target; arrivals then score against the PERSISTED artifact only
    // 2 target docs vs 6 junk docs: junk words are raw-frequent (their
    // log-ratios go strongly negative) while target words stay rare in
    // the pool, so a target-like arrival lands positive
    val pool = (Seq((1L, "the quick brown fox", "en"),
      (2L, "the lazy brown dog", "en")) ++
      (3L to 8L).map(i => (i, "zzz qqq xxx www", "xx")))
      .toDF("doc_id", "text", "lang")
    val ratios = graft.operators.Dsir.ratioTable(
      pool.where(org.apache.spark.sql.functions.col("lang") === "en"),
      pool, "text", dim = 64).localCheckpoint()
    val all = Seq((10L, "the quick dog"), (11L, "qqq zzz www"),
      (12L, "brown fox runs"), (13L, ""))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Dsir.scoreAgainst(
      mem.toDF().toDF("event_id", "text"), ratios, "event_id", "text",
      dim = 64)
      .writeStream.format("memory").queryName("dsir_admit")
      .outputMode("append").start()
    mem.addData(all.take(2): _*)
    q.processAllAvailable()
    mem.addData(all.drop(2): _*)
    q.processAllAvailable()
    val got = spark.table("dsir_admit").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    val batch = graft.operators.Dsir.scoreAgainst(
      all.toDF("event_id", "text"), ratios, "event_id", "text", dim = 64)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got == batch, s"stream $got != batch $batch")
    assert(got(10L)._3 && !got(11L)._3,
      "target-like arrival admitted, OOD arrival not")
    assert(got(13L) == ((0L, 0.0, false)), "empty doc scores 0, not kept")
    q.stop()
  }
}
