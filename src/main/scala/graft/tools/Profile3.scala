package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PeptideAnnotate}

/** Stage profiler for the round-7 heavy tail: d6/d10 (pair generation vs
  * connected components) and pepx (k-mer join vs verify re-join). Not part
  * of the driver contract. Usage: runMain graft.tools.Profile3 <sfDir>
  */
object Profile3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.GraftFunctions.register(spark)

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    docs.cache().count()

    // ---- d6: ngramJaccard pairs + CC
    val d6pairs = time("d6_pairs") {
      val p = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, threshold = 0.5, wordGrams = true).localCheckpoint()
      println(s"  d6 pairs rows=${p.count()}")
      p
    }
    time("d6_cc") { Dedup.duplicateClusters(d6pairs).count() }
    time("d6_cc_2") { Dedup.duplicateClusters(d6pairs).count() }
    time("d6_cc_3") { Dedup.duplicateClusters(d6pairs).count() }

    // ---- d10: fuzzyJoin pairs + CC
    val d10pairs = time("d10_pairs") {
      val p = Dedup.fuzzyJoin(docs, "doc_id", "text",
        keyLen = 12, prefixLen = 4, maxDist = 2).localCheckpoint()
      println(s"  d10 pairs rows=${p.count()}")
      p
    }
    time("d10_cc") { Dedup.duplicateClusters(d10pairs).count() }
    time("d10_cc_2") { Dedup.duplicateClusters(d10pairs).count() }
    time("d10_cc_3") { Dedup.duplicateClusters(d10pairs).count() }

    // ---- pepx: index build vs kmer join vs verify
    val nDocs = docs.count()
    val aas = "ACDEFGHIKLMNPQRSTVWY"
    def aa(seed: org.apache.spark.sql.Column) =
      lit(aas).substr((pmod(hash(seed), lit(20)) + 1).cast("int"), lit(1))
    val prots = spark.range(nDocs * 10)
      .select(concat(lit("P"), col("id")).as("accession"),
        concat_ws("", (0 until 120).map(i =>
          aa(col("id") * 131 + i)): _*).as("sequence"))
      .localCheckpoint()
    val peps = spark.range(nDocs * 20)
      .select(col("id"), (col("id") % (nDocs * 10)).as("pnum"),
        (pmod(hash(col("id")), lit(100)) + 1).cast("int").as("start"),
        (pmod(hash(col("id") + 3), lit(8)) + 8).cast("int").as("plen"))
      .select(concat(lit("q"), col("id")).as("pepId"),
        concat_ws("", (0 until 120).map(i =>
          aa(col("pnum") * 131 + i)): _*)
          .substr(col("start"), col("plen")).as("peptide"))
      .localCheckpoint()
    time("pepx_index_count") {
      println(s"  idx rows=${PeptideAnnotate.kmerIndex(prots, 4).count()}")
    }
    time("pepx_candidates") {
      val c = peps.where(length(col("peptide")) >= 4)
        .withColumn("kmer", col("peptide").substr(1, 4))
        .join(PeptideAnnotate.kmerIndex(prots, 4), Seq("kmer"))
      println(s"  candidates=${c.count()}")
    }
    time("pepx_full") {
      println(s"  matches=${PeptideAnnotate.matchPeptides(peps, prots, k = 4).count()}")
    }
    spark.stop()
  }
}
