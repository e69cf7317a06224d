package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: run only these queries (local iteration aid;
    // the driver always runs with exactly two args = all queries)
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // LOUD failure: write an output dir holding only a _FAILED marker
        // (no parquet part-files). The driver's reader then errors on
        // this query and records `err` — instead of silently omitting
        // the row, which is how a 4-operator break slipped through an
        // entire round's artifacts unnoticed (r8).
        val failDir = Paths.get(s"$outDir/$name")
        try {
          org.apache.commons.io.FileUtils.deleteDirectory(failDir.toFile)
        } catch { case cleanup: Throwable =>
          // If the partial parquet write survives, a stale _SUCCESS next
          // to _FAILED could make the query read as (partial) success —
          // the r8 silent-omission hole. Remove at least the _SUCCESS
          // marker; if even that fails, say so loudly rather than
          // swallow it.
          System.err.println(
            s"[verify] $name: cleanup of partial output failed: $cleanup")
          try Files.deleteIfExists(failDir.resolve("_SUCCESS"))
          catch { case s: Throwable => System.err.println(
            s"[verify] $name: could not remove stale _SUCCESS: $s") }
        }
        Files.createDirectories(failDir)
        Files.writeString(failDir.resolve("_FAILED"),
          s"$name: ${e.toString}\n")
      }
      // reclaim operator-persisted frames between queries (safe: the
      // query's action has completed)
      graft.operators.Dedup.releaseCaches()
      graft.queries.GenomicPipeline.releaseCaches()
    }
    // the memoized corpus LSH index is shared ACROSS queries (d12/e11),
    // so it is released once here, after the last query's action
    graft.queries.Documents.releaseCaches()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
