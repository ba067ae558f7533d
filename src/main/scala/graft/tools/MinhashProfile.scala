package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Stage-by-stage timing of the near-dup pipeline. */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n)")
    }
    time("tokens only") {
      docs.select(TextOps.tokens(col("text")).as("t")).agg(sum(size(col("t")))).collect()(0).getLong(0)
    }
    time("shingles") {
      docs.select(TextOps.shingles(col("text"), 3).as("sh")).agg(sum(size(col("sh")))).collect()(0).getLong(0)
    }
    val sh = docs.select(col("doc_id").cast("long").as("doc_id"),
      TextOps.shingles(col("text"), 3).as("sh"))
    time("signature") {
      sh.select(TextOps.minhashSignature(col("sh"), 12).as("sig")).agg(sum(size(col("sig")))).collect()(0).getLong(0)
    }
    time("banded") {
      sh.select(col("doc_id"),
        posexplode(TextOps.bandKeys(TextOps.minhashSignature(col("sh"), 12), 4, 3))
          .as(Seq("band", "band_key"))).count()
    }
    time("full rep1") { TextOps.nearDupPairs(docs).count() }
    time("full rep2") { TextOps.nearDupPairs(docs).count() }
    spark.stop()
  }
}
