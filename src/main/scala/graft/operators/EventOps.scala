package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream batch operators over `events(event_id, ts, user_id,
 * event_type, value, props)`.
 *
 * The events parquet stores nanosecond timestamps, which Spark's vectorized
 * reader rejects; we read them as raw epoch-nanos longs
 * (`spark.sql.legacy.parquet.nanosAsLong`) and do all time arithmetic on
 * integers — exact, timezone-free, and portable to any oracle engine.
 *
 * Scale notes: the session window is partitioned by user_id (high
 * cardinality, no skew); rollups are hash aggregations with map-side
 * partials. At 100 TB the events table would be date-partitioned so the
 * day rollup prunes partitions.
 */
object EventOps {

  val NanosPerDay: Long = 86400L * 1000 * 1000 * 1000

  /** Read the events table with `ts` as epoch-nanos long. */
  def readEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
  }

  /** Per-(event_type, epoch-day) counts, value sums, distinct users. */
  def dailyRollup(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        (col("ts") / NanosPerDay).cast("long").as("day"),
        col("value"), col("user_id"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        round(sum(col("value")), 2).as("value_sum"),
        count_distinct(col("user_id")).cast("long").as("n_users"))

  /**
   * Sessionization: a new session starts after `gapMinutes` of user
   * inactivity. Returns one row per user with event/session counts and the
   * largest session size.
   */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapNs = gapMinutes * 60L * 1000 * 1000 * 1000
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val withSession = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("new_sess",
        when(col("ts") - lag(col("ts"), 1).over(byUser) > gapNs, 1L)
          .when(lag(col("ts"), 1).over(byUser).isNull, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_sess")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSession
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("sess_events"))
      .groupBy(col("user_id"))
      .agg(sum(col("sess_events")).cast("long").as("n_events"),
        count(lit(1)).cast("long").as("n_sessions"),
        max(col("sess_events")).cast("long").as("max_session_events"))
      .select(col("user_id").cast("long").as("user_id"), col("n_events"),
        col("n_sessions"), col("max_session_events"))
  }
}
