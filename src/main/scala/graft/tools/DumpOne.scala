package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev helper: dump selected SparkEntry queries to parquet for oracle
  * iteration (a focused subset of what Verify does for the whole gate).
  *
  * Usage: sbt "runMain graft.tools.DumpOne <outDir> <name> [name...]"
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-dump-one")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dump] wrote $outDir/$name")
    }
    spark.stop()
  }
}
