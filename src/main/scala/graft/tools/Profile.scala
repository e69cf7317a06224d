package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{hashing, text}

/** Ad-hoc stage profiler for the heavy operators (not part of the driver
  * contract). Usage: runMain graft.tools.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
    docs0.cache().count()

    val docs = docs0.select(col("doc_id").as("id"),
      array_distinct(text.wordShingles(col("text"), 3)).as("shingles"))
      .where(size(col("shingles")) > 0)

    time("shingles") { docs.count() }
    val ab = docs.withColumn("_ab", hashing.minhashPairs(col("shingles")))
    time("minhashPairs") { ab.select(sum(size(col("_ab")))).count() }
    val sigs = ab.withColumn("sig", hashing.minhashFromPairs(col("_ab"), 16))
    time("sig") { sigs.select(sum(size(col("sig")))).count() }
    val buckets = sigs.select(col("id"),
      explode(hashing.bandKeys(col("sig"), 8, 2)).as("bucket"))
    time("buckets") { buckets.count() }
    time("d2_full") {
      graft.operators.Dedup.minhashLsh(docs0, "doc_id", "text").count()
    }
    time("d4_full") {
      graft.operators.Dedup.ngramJaccard(docs0, "doc_id", "text",
        n = 3, threshold = 0.5, wordGrams = true).count()
    }
    // d4 stage split (mirrors ngramJaccard internals)
    locally {
      graft.plans.GraftFunctions.register(spark)
      val raw = docs0.select(col("doc_id").as("id"),
        call_function("graft_md5_array",
          array_distinct(call_function("graft_word_shingles",
            text.words(col("text")), lit(3)))).as("grams"))
        .where(size(col("grams")) > 0)
      time("d4_raw") { raw.count() }
      val dfreq = raw.select(explode(col("grams")).as("g"))
        .groupBy("g").agg(count(lit(1)).as("df"))
      time("d4_dfreq") { dfreq.count() }
      val docs = raw.select(col("id"), explode(col("grams")).as("g"))
        .join(dfreq, Seq("g"))
        .groupBy("id")
        .agg(transform(
          array_sort(collect_list(struct(col("df"), col("g")))),
          s => s.getField("g")).as("grams")).persist()
      time("d4_docs") { docs.count() }
      val threshold = 0.5
      val prefixLen =
        (size(col("grams")) - ceil(size(col("grams")) * threshold) + 1)
          .cast("int")
      val keyed = docs.select(col("id"), size(col("grams")).as("sz"),
        posexplode(slice(col("grams"), lit(1), prefixLen))
          .as(Seq("p", "pfx")))
      val pairs = keyed
        .select(col("pfx"), col("id").as("id1"), col("sz").as("sz1"),
          col("p").as("p1"))
        .join(keyed.select(col("pfx"), col("id").as("id2"),
          col("sz").as("sz2"), col("p").as("p2")), Seq("pfx"))
        .where(col("id1") < col("id2"))
        .where(least(col("sz1"), col("sz2")).cast("double") >=
          lit(threshold) * greatest(col("sz1"), col("sz2")))
        .where((lit(1) + least(col("sz1") - col("p1") - 1,
          col("sz2") - col("p2") - 1)).cast("double") >=
          ceil(lit(threshold / (1 + threshold)) *
            (col("sz1") + col("sz2"))).cast("double"))
        .select("id1", "id2").distinct()
      time("d4_pairs") { pairs.count() }
      time("d4_verify") {
        pairs
          .join(docs.select(col("id").as("id1"), col("grams").as("g1")),
            Seq("id1"))
          .join(docs.select(col("id").as("id2"), col("grams").as("g2")),
            Seq("id2"))
          .withColumn("jaccard", round(
            size(array_intersect(col("g1"), col("g2"))).cast("double") /
              size(array_union(col("g1"), col("g2"))), 5))
          .where(col("jaccard") >= 0.5).count()
      }
      docs.unpersist()
    }
    spark.stop()
  }
}
