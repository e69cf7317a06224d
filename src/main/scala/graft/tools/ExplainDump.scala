package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named SparkEntry queries to
  * `<outDir>/<name>_<tag>.txt` — the plans/r17 before/after evidence.
  *
  * Usage: sbt "runMain graft.tools.ExplainDump <outDir> <tag> <name>..."
  * (tag = "before" | "after"). Runs at sf0.1 so plan shapes (AQE
  * thresholds, stats) match the bench's inputs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-explain-dump")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(outDir))
    try {
      graft.fixtures.GenomicFixtures.ensure(spark)
      graft.queries.GenomicPipeline.proteinDb(spark)
      graft.queries.Relational.ensureBucketed(spark, sfDir)
    } catch { case t: Throwable =>
      System.err.println(s"[explain] prep failed: $t")
    }
    args.drop(2).foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
          txt.getBytes("UTF-8"))
        println(s"[explain] wrote $outDir/${name}_$tag.txt")
      } catch { case t: Throwable =>
        System.err.println(s"[explain] $name failed: $t")
      }
    }
    spark.stop()
  }
}
