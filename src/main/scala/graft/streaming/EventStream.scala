package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Streaming analytics over the events feed: watermarked, windowed
 * aggregation — the Structured Streaming counterpart of
 * `EventOps.dailyRollup`. Late events beyond the watermark are dropped;
 * state is bounded by (watermark horizon / window size) windows per
 * event_type.
 */
object EventStream {

  /** Explicit schema (streaming file sources cannot infer), with the
    * nanosecond timestamp read as a raw long. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // epoch nanos (nanosAsLong)
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /**
   * Watermarked per-(window, event_type) rollup of an events directory
   * treated as a stream. `windowLength` e.g. "6 hours"; `lateness` is the
   * watermark horizon for late data.
   */
  def windowedRollup(spark: SparkSession, dir: String,
      windowLength: String = "6 hours",
      lateness: String = "1 hour"): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_ts", lateness)
      .groupBy(window(col("event_ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum(col("value")), 2).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("value_sum"))
  }
}
