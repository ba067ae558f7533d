package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.streaming.EventStream
      .windowedRollup(spark, "/root/testdata/sf0.001", "12 hours", "1 hour")
      .writeStream.format("memory").queryName("ev")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    println("emitted window x type rows: " + spark.sql("SELECT count(*) FROM ev").collect()(0).getLong(0))
    spark.sql("SELECT window_start, event_type, n_events, value_sum FROM ev ORDER BY window_start, event_type").show(8, false)
    spark.sql("SELECT max(window_start) AS last_emitted FROM ev").show(false)
    println("(data runs to 2024-01-30 23:57 -> the 2024-01-30 12:00 window is unclosed and correctly absent)")
    spark.stop()
  }
}
