package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway environment probe for cross-engine parity risks. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    println("=== events ns timestamp read ===")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      ev.printSchema()
      ev.select(col("event_id"), col("ts")).orderBy("event_id").show(3, false)
    } catch { case e: Throwable => println("EVENTS READ FAILED: " + e.getMessage.take(300)) }

    println("=== regexp/token functions ===")
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs.select(
      col("doc_id"),
      size(filter(split(trim(col("text")), "\\s+"), x => x =!= "")).as("n_tokens"),
      regexp_count(col("text"), lit("\\bthe\\b")).as("n_the"),
      sha2(col("text"), 256).as("sha"),
      md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
      .orderBy("doc_id").show(3, false)

    println("=== double fold determinism sample (dot of first two embeddings) ===")
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val two = emb.filter(col("vec_id") < 2).orderBy("vec_id")
      .agg(collect_list(col("embedding")).as("es"))
      .select(
        aggregate(zip_with(element_at(col("es"), 1), element_at(col("es"), 2),
          (a, b) => a.cast("double") * b.cast("double")), lit(0.0d), (acc, v) => acc + v).as("dot"),
        aggregate(transform(element_at(col("es"), 1), a => a.cast("double") * a.cast("double")),
          lit(0.0d), (acc, v) => acc + v).as("n1sq"))
    two.show(false)
    val r = two.collect()(0)
    println(f"dot=${r.getDouble(0)}%.17g n1sq=${r.getDouble(1)}%.17g")

    spark.stop()
  }
}
