package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Boots a SparkSession with spark.sql.extensions=graft.plans.GraftExtensions
  * and exercises the injected functions through plain SQL — no manual
  * BoundedTopK.register / GraftFunctions.register calls. This is the path a
  * cluster deployment uses (--conf spark.sql.extensions=...), so it needs
  * its own test: per-session registration passing does not prove the
  * extensions hook wires the same builders.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions injects bounded_top_k and graft_* functions") {
    // getOrCreate only applies extensions when it BUILDS a session — make
    // sure it can't return a leftover one from another suite
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .appName("extensions-test")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      Seq((1L, 0.9), (2L, 0.5), (3L, 0.7)).toDF("id", "score")
        .createOrReplaceTempView("scores")

      val tk = spark.sql(
        "SELECT bounded_top_k(struct(score, id), 2) AS tk FROM scores")
        .collect()(0).getSeq[Row](0)
      assert(tk.map(_.getLong(1)) == Seq(1L, 3L)) // best-first, k-capped

      val native = spark.sql(
        """SELECT
          |  graft_hamming(graft_simhash(array('a','b','c'), 16),
          |                graft_simhash(array('a','b','c'), 16)) AS d,
          |  graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |  size(graft_minhash_sig(array('x','y'), 4)) AS k,
          |  graft_word_shingles(array('a','b','c'), 2) AS sh,
          |  graft_md5_char_ngrams('abcd', 3) AS ng
          |""".stripMargin).collect()(0)
      assert(native.getAs[Int]("d") == 0)
      assert(math.abs(native.getAs[Double]("c") - 1.0) < 1e-12)
      assert(native.getAs[Int]("k") == 4)
      assert(native.getSeq[String](3) == Seq("a b", "b c"))
      assert(native.getSeq[String](4).length == 2) // 'abc','bcd' hashed

      // catalog-exposed hashing: a null element stays null (never NPE —
      // the function is reachable from arbitrary SQL), non-null elements
      // still bucket; dim <= 0 fails typed, not ArithmeticException
      val nb = spark.sql(
        "SELECT graft_md5_buckets(array('a', NULL, 'b'), 64) AS v")
        .collect()(0).getSeq[Any](0)
      assert(nb.length == 3 && nb(1) == null &&
        nb(0).isInstanceOf[Long] && nb(2).isInstanceOf[Long])
      val dimErr = intercept[Exception] {
        spark.sql("SELECT graft_md5_buckets(array('a'), 0)").collect()
      }
      assert(dimErr.toString.contains("dim must be > 0") ||
        dimErr.getCause != null &&
          dimErr.getCause.toString.contains("dim must be > 0"),
        dimErr.toString)

      // RangeJoinRule injected: the natural range join compiles to the
      // binned equi-join (bins span 10000 by default, so the two sides
      // only meet where containment is possible) with no nested-loop join
      val graftTranslate = spark.sql(
        "SELECT graft_translate_dna('ATGTTTTAA', 0) AS p").collect()(0)
      assert(graftTranslate.getString(0) == "MF*")
      Seq(("1", 5L, "v1"), ("1", 25000L, "v2"), ("2", 5L, "v3"))
        .toDF("chrom", "pos", "vid").createOrReplaceTempView("pts")
      Seq(("1", 1L, 10L, "e1"), ("1", 24990L, 26000L, "e2"),
        ("2", 100L, 200L, "e3"))
        .toDF("chrom", "start", "end", "eid")
        .createOrReplaceTempView("iv")
      val rj = spark.sql(
        """SELECT p.vid, i.eid FROM pts p JOIN iv i
          |ON p.chrom = i.chrom AND p.pos >= i.start AND p.pos <= i.end
          |""".stripMargin)
      val plan = rj.queryExecution.executedPlan.toString
      assert(plan.contains("Generate explode(sequence"),
        s"range join was not rewritten to the binned plan:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
      assert(rj.collect().map(r => (r.getString(0), r.getString(1))).toSet
        == Set(("v1", "e1"), ("v2", "e2")))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
