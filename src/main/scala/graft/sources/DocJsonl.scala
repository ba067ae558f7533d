package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * JSON-Lines document corpus ingest/export — the interchange format
 * LLM training corpora actually ship in (one JSON object per line:
 * The Pile, Dolma, FineWeb all publish JSONL/JSONL.zst). Spark's
 * native json source IS line-delimited by default, so both directions
 * stay fully distributed: one task per file split, no driver-side
 * parsing.
 *
 * Read contract: explicit schema (never inference — a schema-inference
 * pass over 100 TB is a full extra scan), PERMISSIVE mode with the
 * malformed line captured in `_corrupt` — crawl-derived JSONL always
 * contains some broken lines, and a pipeline must COUNT them, not die
 * on the first one ([[ingestReport]] surfaces the count per file).
 */
object DocJsonl {

  /** The documents-table schema (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Export a documents frame as JSONL (one object per line, UTF-8;
    * Spark's writer escapes control characters, so embedded newlines
    * and quotes in `text` round-trip losslessly). `compression`:
    * "none", "gzip", "bzip2", "deflate" — published corpora ship
    * compressed, and the reader picks the codec from the file
    * extension with no option needed. gzip is NOT splittable (one
    * task per FILE on read), so compressed exports inherit their
    * parallelism from the write — size part files accordingly. */
  def write(docs: DataFrame, path: String,
      compression: String = "none"): Unit =
    docs.select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("long").as("n_chars"))
      .write.mode("overwrite").option("compression", compression)
      .json(path)

  /** Read a JSONL corpus with the documents schema, dropping malformed
    * and `doc_id`-less lines (the contract makes `doc_id` mandatory).
    *
    * Corruption is detected by the corrupt column — the only signal
    * PERMISSIVE guarantees for a malformed line. The filter
    * deliberately also references `doc_id`: Spark disallows any plan
    * whose referenced columns reduce to only the internal corrupt
    * record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — a bare
    * `count()` after a corrupt-only filter would throw), and the
    * extra data-column predicate keeps such downstream prunes
    * legal. */
  def read(spark: SparkSession, path: String): DataFrame =
    quarantine(spark, path)
      .filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .drop("_corrupt")

  /** Every line, parsed where possible: malformed lines carry their
    * raw text in `_corrupt` (and possibly PARTIAL data columns — see
    * [[read]]). */
  def quarantine(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(documentsSchema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)

  /** Ingest health report: per-source parsed-line counts and char
    * volume, with malformed lines under the `_corrupt` bucket — the
    * triage view before a crawl batch enters the pipeline. One scan,
    * one small keyed aggregation. */
  def ingestReport(spark: SparkSession, path: String): DataFrame =
    quarantine(spark, path)
      .groupBy(when(col("_corrupt").isNotNull, lit("_corrupt"))
        .otherwise(coalesce(col("source"), lit("_missing"))).as("source"))
      .agg(count(lit(1)).cast("long").as("n_lines"),
        coalesce(sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)),
          lit(0L)).cast("long").as("n_corrupt"),
        coalesce(sum(when(col("_corrupt").isNull, col("n_chars"))),
          lit(0L)).cast("long").as("sum_chars"))
}
