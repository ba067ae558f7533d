package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Streaming LLM-pipeline operators over a documents feed — the
 * Structured Streaming counterpart of `TextOps.dedupExact`: a training
 * corpus arriving continuously (crawl batches dropped into a directory)
 * is deduplicated by content hash as it lands.
 *
 * State is bounded by the watermark horizon via
 * `dropDuplicatesWithinWatermark`: a duplicate arriving within
 * `lateness` of the original is dropped, older state is evicted — the
 * property that makes exact dedup runnable on an unbounded stream,
 * where the batch operator's full-corpus groupBy cannot.
 */
object DocStream {

  /** Explicit feed schema (streaming file sources cannot infer):
    * the batch documents table plus the ingest event-time column the
    * watermark needs. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("ingest_ts", TimestampType)))

  /**
   * Exact-dedup stream: keep one document per content hash within the
   * watermark horizon. Emits the surviving documents with their hash
   * (append mode); duplicates inside `lateness` are suppressed.
   */
  def dedupStream(spark: SparkSession, dir: String,
      lateness: String = "10 minutes"): DataFrame =
    spark.readStream
      .schema(documentsSchema)
      .parquet(dir)
      .withColumn("text_sha256", sha2(col("text"), 256))
      .withWatermark("ingest_ts", lateness)
      .dropDuplicatesWithinWatermark("text_sha256")
}
