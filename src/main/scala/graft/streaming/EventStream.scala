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

  /**
   * Structural self-check of the streaming rollup against the batch
   * computation, shaped for an external oracle that cannot run a Spark
   * stream: RUNS [[windowedRollup]] to completion (AvailableNow trigger,
   * memory sink), recomputes the same windows in batch, and returns ONE
   * row of violation counts that must all be zero for any correct
   * streaming execution — the same all-zeros-invariants pattern as the
   * trained-IVF check. Append mode only emits a window once the
   * watermark passes its END, so the batch comparison set is the windows
   * with `window_end <= max(event_ts) - lateness` (the stream's final
   * watermark); the still-open tail windows are legitimately absent.
   *
   * Violations counted:
   *  - `missing_window` closed batch windows the stream never emitted;
   *  - `extra_window`   emitted rows with no closed batch counterpart
   *                     (phantom or emitted-before-close);
   *  - `bad_count`      emitted n_events differing from batch;
   *  - `bad_sum`        emitted value_sum differing from batch (2dp);
   *  - `empty_stream`   1 when nothing was emitted at all — guards the
   *                     other zeros from passing vacuously.
   */
  def rollupCheck(spark: SparkSession, dir: String,
      windowLength: String = "6 hours", lateness: String = "1 hour",
      timeoutMs: Long = 300000L): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val view = "graft_stream_rollup_check"
    if (spark.catalog.tableExists(view)) spark.catalog.dropTempView(view)
    val q = windowedRollup(spark, dir, windowLength, lateness)
      .writeStream.format("memory").queryName(view)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      require(q.awaitTermination(timeoutMs),
        s"rollupCheck: stream did not drain within ${timeoutMs} ms")
    } finally q.stop()
    val streamed = spark.table(view)
      .select(col("window_start"), col("event_type"),
        col("n_events").as("n_s"), col("value_sum").as("sum_s"))
    val events = spark.read.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
    val batch = events
      .groupBy(window(col("event_ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_b"),
        round(sum(col("value")), 2).as("sum_b"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n_b"), col("sum_b"))
    // the stream's final watermark (1-row broadcast, no driver collect)
    val wm = broadcast(events.agg(
      (max(col("event_ts")) - expr(s"interval $lateness")).as("wm")))
    val closed = batch.crossJoin(wm)
      .filter(col("window_end") <= col("wm"))
      .select(col("window_start"), col("event_type"), col("n_b"),
        col("sum_b"))
    closed.join(streamed, Seq("window_start", "event_type"), "full_outer")
      .agg(
        coalesce(sum(when(col("n_s").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("missing_window"),
        coalesce(sum(when(col("n_b").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("extra_window"),
        coalesce(sum(when(col("n_b").isNotNull && col("n_s").isNotNull &&
          col("n_b") =!= col("n_s"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("bad_count"),
        coalesce(sum(when(col("sum_b").isNotNull && col("sum_s").isNotNull &&
          col("sum_b") =!= col("sum_s"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("bad_sum"))
      .crossJoin(broadcast(streamed.agg(
        (count(lit(1)) === 0).cast("long").as("empty_stream"))))
  }
}
