package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.GenomicFixtures
import graft.functions.dna
import graft.operators.{HaploProteins, PeptideAnnotate, PeptideVariants}

/** Ad-hoc profiler for the genomic-pipeline fixed overheads: splits
  * plan-optimization time from execution time per hot query (not part of
  * the driver contract). Usage: runMain graft.tools.Profile2
  */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE2 $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("ensure") { GenomicFixtures.ensure(spark) }
    graft.plans.GraftFunctions.register(spark)

    // v4_translate
    val fx = GenomicFixtures.dir
    val v4 = spark.read.parquet(s"$fx/cdna.parquet")
      .select(col("transcript_id"), col("sequence"),
        explode(sequence(lit(0), lit(2))).as("frame"))
      .select(col("transcript_id"), col("frame").cast("long").as("frame"),
        dna.translateDna(col("sequence"), col("frame")).as("protein"))
    time("v4_optimize") { v4.queryExecution.executedPlan }
    time("v4_execute") { v4.collect().length }
    time("v4_execute_again") { v4.collect().length }

    // pv1: proteinDatabase on per-variant input
    val pv = graft.queries.GenomicPipeline.queries("pv1_provar")(spark, "")
    time("pv1_optimize") { pv.queryExecution.executedPlan }
    time("pv1_execute") { pv.collect().length }

    // protein-DB stages
    val hi = graft.queries.GenomicPipeline.haploInput(spark)
    time("haploInput_optimize") { hi.queryExecution.executedPlan }
    time("haploInput_execute") { hi.collect().length }
    val pd = HaploProteins.proteinDatabase(
      graft.queries.GenomicPipeline.haploInput(spark))
    time("proteinDatabase_optimize") { pd.queryExecution.executedPlan }
    time("proteinDatabase_execute") { pd.collect().length }
    val db = time("proteinDb_materialize") {
      graft.queries.GenomicPipeline.proteinDb(spark)
    }
    val p2 = graft.queries.GenomicPipeline.queries("p2_pep_annotate")(
      spark, "")
    time("p2_optimize") { p2.queryExecution.executedPlan }
    time("p2_execute") { p2.collect().length }

    spark.stop()
  }
}
