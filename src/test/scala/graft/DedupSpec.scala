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
}
