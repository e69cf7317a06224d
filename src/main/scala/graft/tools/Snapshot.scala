package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the committed expected-output parquet snapshots for the
  * pipeline queries that aren't expressible as one DuckDB SQL statement
  * (h4_protein_db, h5_protein_dedup, pv1_provar). Their oracles are
  * `SELECT * FROM read_parquet('<fixtures>/expected/<name>.parquet')`, so
  * the driver gate hash-checks the full pipeline against these snapshots.
  *
  * The snapshots are NOT self-fulfilling: the same rows are asserted
  * field-by-field against hand-computed reference semantics in
  * HaploProteinsSpec (derived on paper from process_haplotypes.py /
  * process_variants.py / coordinates_toolbox.py) and MediaSpec
  * (per-pixel luminance means of the committed PNGs). Run this main ONLY
  * after those suites are green, then commit the refreshed files.
  *
  * Usage: sbt "runMain graft.tools.Snapshot [outDir]"
  */
object Snapshot {
  val names = Seq("h4_protein_db", "h5_protein_dedup", "pv1_provar",
    "f9_cdna_write", "m3_media_features", "m6_phash_dedup",
    "t38_compress_ratio")

  def main(args: Array[String]): Unit = {
    val outDir = if (args.nonEmpty) args(0) else "/tmp/graft_snapshot"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-snapshot")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // coalesce(1): a committed fixture wants one file; 5-11 rows
      graft.SparkEntry.queries(name)(spark, "")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[snapshot] wrote $outDir/$name.parquet")
    }
    spark.stop()
  }
}
