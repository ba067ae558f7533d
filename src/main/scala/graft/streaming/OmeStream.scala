package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.OmeOps
import graft.schema.Fixtures

/**
 * Streaming imaging analytics — the live counterpart of the
 * segmentation surface: planes arriving continuously (an acquisition
 * system dropping files, cf. [[OmeStreamIngest]]) are segmented and
 * measured AS THEY LAND. Segmentation is per-plane and stateless, so
 * the streaming formulation needs no watermark or state store: each
 * micro-batch runs the same native union-find kernel the batch
 * operator uses, and results append exactly once per plane.
 */
object OmeStream {

  /** Explicit plane-feed schema (streaming file sources cannot infer). */
  val planeSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("t", IntegerType),
    StructField("c", IntegerType),
    StructField("z", IntegerType),
    StructField("size_x", IntegerType),
    StructField("size_y", IntegerType),
    StructField("pixels", ArrayType(IntegerType))))

  /** the shared check mask: the modular pattern `ome_segment` pins. */
  private def segMask = transform(col("pixels"),
    v => when((v * v) % 7 < 2, lit(1)).otherwise(lit(0)))

  /** per-plane object count + total foreground area over a plane feed
    * — in-row over the kernel's object array, no explode, no state. */
  private def segmentCounts(planes: DataFrame): DataFrame =
    planes.select(col("image_id"), col("t"), col("c"), col("z"),
      graft.functions.cc_objects(segMask, col("size_x").cast("int"))
        .as("objs"))
      .select(col("image_id"), col("t"), col("c"), col("z"),
        size(col("objs")).cast("long").as("n_objects"),
        coalesce(aggregate(transform(col("objs"),
          o => o.getField("area").cast("long")), lit(0L), _ + _), lit(0L))
          .as("total_area"))

  /** STREAMING per-plane segmentation counts from a parquet feed dir. */
  def segmentCountStream(spark: SparkSession, feedDir: String): DataFrame = {
    graft.functions.ensureRegistered(spark)
    segmentCounts(spark.readStream.schema(planeSchema).parquet(feedDir))
  }

  /**
   * Structural check: the streamed per-plane segmentation must agree
   * with the batch [[OmeOps.segmentObjects]]-equivalent computation
   * plane-for-plane — counts AND areas, exactly. One row of zeros when
   * they do; `empty_stream` flags a vacuous pass.
   */
  def segmentCheck(spark: SparkSession,
      feedDir: String = "/tmp/graft_stream_omeseg_feed",
      timeoutMs: Long = 300000L): DataFrame = {
    graft.functions.ensureRegistered(spark)
    val streamed = StreamDrain.once(spark, "graft_stream_omeseg_check",
        s"corpus4d|$feedDir", timeoutMs)({
      OmeOps.explodePlanes(Fixtures.corpus4d(spark))
        .select(col("image_id"), col("t"), col("c"), col("z"),
          col("size_x").cast("int").as("size_x"),
          col("size_y").cast("int").as("size_y"), col("pixels"))
        .write.mode("overwrite").parquet(feedDir)
      segmentCountStream(spark, feedDir)
    })
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("n_objects").as("n_s"), col("total_area").as("a_s"))
    val batch = segmentCounts(
      spark.read.schema(planeSchema).parquet(feedDir))
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("n_objects").as("n_b"), col("total_area").as("a_b"))
    batch.join(streamed, Seq("image_id", "t", "c", "z"), "full_outer")
      .agg(
        coalesce(sum(when(col("n_s").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("missing_plane"),
        coalesce(sum(when(col("n_b").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("extra_plane"),
        coalesce(sum(when(col("n_b").isNotNull && col("n_s").isNotNull &&
          col("n_b") =!= col("n_s"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("bad_count"),
        coalesce(sum(when(col("a_b").isNotNull && col("a_s").isNotNull &&
          col("a_b") =!= col("a_s"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("bad_area"))
      .crossJoin(broadcast(streamed.agg(
        (count(lit(1)) === 0).cast("long").as("empty_stream"))))
  }
}
