package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning,
  RangePartitioning, SinglePartition}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Whole-gate plan lint: every `SparkEntry.queries` entry, not just the
  * ~35 hand-pinned plans in PlanSpec, must keep the shape that survives
  * a 100x scale-up. Individual operators were audited as they landed;
  * this makes the audit a regression-tested property — a later edit
  * that degrades some query to a cartesian product or sneaks in an
  * extra shuffle fails HERE, named, instead of surviving until a judge
  * re-reads the plan.
  *
  * Checks, per query, against `fixtures/expected/plan_pins.tsv`:
  *   - zero CartesianProductExec anywhere (a non-broadcast cross join
  *     is corpus x corpus work at scale — always a bug);
  *   - shuffle-exchange counts by partitioning kind (hash / range /
  *     single-partition) must not EXCEED the pinned counts. Fewer is
  *     an improvement: allowed (update the pin to lock it in).
  *     Single-partition exchanges are pinned separately because they
  *     are the dangerous kind: legitimate only under a final global
  *     aggregate (partials make the exchanged volume one row per map
  *     task), catastrophic when a data-scale frame lands on them.
  *
  * The counts are taken with AQE DISABLED: the adaptive wrapper hides
  * plan internals until execution and re-plans with runtime stats, so
  * the static plan is both walkable and deterministic — the same
  * property that makes the pins meaningful across machines.
  *
  * Regenerate pins after an INTENTIONAL plan change:
  *   GRAFT_PLAN_PIN_REGEN=1 sbt "testOnly graft.PlanLintSpec"
  * (set via `set Test / envVars ...` in the sbt shell), then review the
  * tsv diff — a count that went UP needs a justification in the commit.
  */
class PlanLintSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"
  private val pinPath = "fixtures/expected/plan_pins.tsv"

  override def beforeAll(): Unit = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE off: walkable static plans, deterministic exchange counts
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("plan-lint")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }

  override def afterAll(): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  case class Counts(cartesian: Int, hash: Int, range: Int, single: Int) {
    def tsv: String = s"$cartesian\t$hash\t$range\t$single"
  }

  private def counts(plan: SparkPlan): Counts = {
    val cart = plan.collect { case c: CartesianProductExec => c }.size
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    def n(pf: PartialFunction[Any, Unit]) =
      shuffles.count(s => pf.isDefinedAt(s.outputPartitioning))
    Counts(cart,
      n { case _: HashPartitioning => },
      n { case _: RangePartitioning => },
      n { case SinglePartition => })
  }

  private def lint(df: DataFrame): Counts =
    counts(df.queryExecution.executedPlan)

  test("every gate query: no cartesian product, exchange counts within " +
    "the committed pins") {
    graft.fixtures.GenomicFixtures.ensure(spark)
    val regen = sys.env.get("GRAFT_PLAN_PIN_REGEN").contains("1")
    val pins: Map[String, Counts] =
      if (regen) Map.empty
      else java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(pinPath)).toArray.map(_.toString)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val f = l.split("\t")
          f(0) -> Counts(f(1).toInt, f(2).toInt, f(3).toInt, f(4).toInt)
        }.toMap
    val measured = scala.collection.mutable.LinkedHashMap[String, Counts]()
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val c = lint(fn(spark, sf))
        measured(name) = c
        if (c.cartesian > 0)
          failures += s"$name: ${c.cartesian} CartesianProductExec — a " +
            "non-broadcast cross join never survives at scale"
        if (!regen) pins.get(name) match {
          case None =>
            failures += s"$name: no pin in $pinPath — regenerate pins " +
              "and review the new entry"
          case Some(p) =>
            if (c.hash > p.hash || c.range > p.range || c.single > p.single)
              failures += s"$name: exchanges grew beyond pin " +
                s"(hash ${c.hash}>${p.hash} | range ${c.range}>${p.range}" +
                s" | single ${c.single}>${p.single})"
        }
      } catch { case e: Throwable =>
        failures += s"$name: plan construction failed: $e"
      } finally {
        graft.operators.Dedup.releaseCaches()
        graft.queries.GenomicPipeline.releaseCaches()
      }
    }
    graft.queries.Documents.releaseCaches()
    if (regen) {
      val header = "# query\tcartesian\thash_exchanges\trange_exchanges" +
        "\tsingle_partition_exchanges  (AQE off, sf0.001; see PlanLintSpec)"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(pinPath),
        (header +: measured.toSeq.map { case (k, c) => s"$k\t${c.tsv}" })
          .mkString("", "\n", "\n"))
      info(s"regenerated ${measured.size} pins at $pinPath")
    } else {
      // every pinned query must still exist — a renamed gate id would
      // otherwise leave a stale pin claiming coverage
      pins.keys.filterNot(measured.contains).foreach { stale =>
        failures += s"$stale: pinned but no longer in SparkEntry.queries"
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} plan-lint failures:\n" +
        failures.map("  - " + _).mkString("\n"))
  }

  test("the lint detects a deliberately broken plan") {
    // a non-broadcast cross join of two data-scale frames: the exact
    // shape the gate must never contain. Auto-broadcast is disabled so
    // the tiny test frames take the plan two BIG frames would take.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    val broken =
      try {
        val a = spark.range(1000).select(col("id").as("a"))
        val b = spark.range(1000).select(col("id").as("b"))
        lint(a.crossJoin(b))
      } finally spark.conf.set(key, prev)
    assert(broken.cartesian > 0,
      "lint failed to flag a raw cartesian product")
    // repartition(1) of a data frame: the single-partition shuffle the
    // pins hold at today's count
    val squeezed = lint(spark.range(1000).repartition(1)
      .select(sum(col("id"))))
    assert(squeezed.single > 0,
      "lint failed to count a single-partition exchange")
  }
}
