package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch probe: does persist() preserve HashPartitioning for a
  * downstream groupBy/join (r18 measurement tool, not a query path)?
  */
object ProbePart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(100000)
      .select(col("id") % 1000 as "k", col("id") as "v")
      .repartition(col("k"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    val agg = df.groupBy("k").agg(sum("v"))
    agg.explain()
    // broadcast-joined side preserves streamed partitioning -> agg free?
    val small = spark.range(1000).select(col("id").as("k"), lit(7).as("w"))
    val bj = df.join(broadcast(small), Seq("k")).groupBy("k")
      .agg(sum(col("v") + col("w")))
    bj.explain()
    spark.stop()
  }
}
