package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the dx_dedup_scale regression hunt: times the
  * minhashLsh pair generation and the duplicateClusters consumption
  * separately, with per-phase stage/shuffle counters. Not part of the
  * driver contract.
  */
object ProfDx {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stageCount = new java.util.concurrent.atomic.AtomicLong()
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
          stageCount.incrementAndGet()
          val m = sc.stageInfo.taskMetrics
          if (m != null)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    def phase(name: String)(body: => Unit): Unit = {
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      val s0 = stageCount.get(); val b0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftListenerBridge.drain(spark.sparkContext)
      println(f"[profdx] $name%-28s ${dt}%8.2fs  stages ${stageCount
        .get - s0}%3d  shufMB ${(shuffleBytes.get - b0) / 1e6}%8.1f")
    }
    val n = args.headOption.map(_.toLong).getOrElse(300000L)
    val vocab = (0 until 512).map(i => "" + ('a' + i % 26).toChar +
      ('a' + (i / 26) % 26).toChar + ('a' + (i / 676) % 26).toChar)
    val vlit = array(vocab.map(lit): _*)
    def word(seed: org.apache.spark.sql.Column) =
      element_at(vlit, (pmod(hash(seed), lit(512)) + 1).cast("int"))
    val docs = spark.range(n)
      .select(col("id"),
        when(pmod(col("id"), lit(10)) === 0 && col("id") > 0,
          col("id") - 1).otherwise(col("id")).as("seed"))
      .select(col("id").as("doc_id"),
        concat_ws(" ",
          (0 until 29).map(i => word(col("seed") * 31 + i)) :+
            word(col("id") * 31 + 29): _*).as("text"))
      .localCheckpoint()
    (1 to 2).foreach { round =>
      phase(s"r$round minhashLsh.count") {
        val df = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
        if (round == 1 && args.length > 1)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(args(1)),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
              .getBytes("UTF-8"))
        df.count()
      }
      graft.operators.Dedup.releaseCaches()
      phase(s"r$round full dx body") {
        val pairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text")
        graft.operators.Dedup.duplicateClusters(pairs).count()
      }
      graft.operators.Dedup.releaseCaches()
    }
    spark.stop()
  }
}
