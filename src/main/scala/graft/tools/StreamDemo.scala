package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Events

/** Standalone driver for the streaming operators: feeds a live
  * micro-batch stream through sessionizeStream and prints the emitted
  * sessions. Usage: runMain graft.tools.StreamDemo
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("user_id", "ts", "value")
    val q = Events.sessionizeStream(events, gapMinutes = 30, "10 minutes")
      .writeStream.format("memory").queryName("demo_sessions")
      .outputMode("append").start()

    println("DEMO batch 1: u7 events at 10:01 and 10:05 (one open session)")
    mem.addData((7L, ts(10, 1), 1.0), (7L, ts(10, 5), 2.0))
    q.processAllAvailable()
    spark.table("demo_sessions").show(truncate = false)

    println("DEMO batch 2: u7 at 10:55 (gap > 30min -> session closes), " +
      "u9 at 10:56 (new open session)")
    mem.addData((7L, ts(10, 55), 4.0), (9L, ts(10, 56), 9.0))
    q.processAllAvailable()
    spark.table("demo_sessions").show(truncate = false)

    println("DEMO batch 3: u7 at 12:30 advances the watermark far enough " +
      "to time out both open sessions")
    mem.addData((7L, ts(12, 30), 1.0))
    q.processAllAvailable()
    mem.addData((7L, ts(12, 31), 1.0)) // one more batch so timeouts fire
    q.processAllAvailable()
    spark.table("demo_sessions").show(truncate = false)

    q.stop()
    spark.stop()
  }
}
