package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.OmeOps
import graft.schema.Fixtures

/** Scratch driver for one-off probes (see .claude/skills/verify). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"=== $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val corpus = Fixtures.mixedCorpus(spark)
    println(s"=== corpus partitions: ${corpus.rdd.getNumPartitions}")
    // warm-up full path once
    graft.OmeArrow.export(corpus, how = "ome-parquet",
      out = "/tmp/probe_rt.parquet", columnName = "image")
    import org.apache.spark.sql.functions.col
    for (i <- 1 to 2) {
      time(s"plain parquet write rep$i") {
        corpus.select(col("ome_arrow").as("image")).write
          .mode("overwrite").option("compression", "zstd")
          .parquet("/tmp/probe_rt_plain.parquet")
      }
      time(s"stamp rep$i") {
        graft.sources.OmeParquet.stampFooterMetadata(spark,
          "/tmp/probe_rt_plain.parquet", Map("k" -> "v"))
      }
      time(s"export rep$i") {
        graft.OmeArrow.export(corpus, how = "ome-parquet",
          out = "/tmp/probe_rt.parquet", columnName = "image")
      }
      time(s"read rep$i") {
        graft.OmeArrow.read(spark, "/tmp/probe_rt.parquet").count()
      }
      time(s"read+describe rep$i") {
        OmeOps.describe(
          graft.OmeArrow.read(spark, "/tmp/probe_rt.parquet")).count()
      }
    }
    val nparts = new java.io.File("/tmp/probe_rt.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    println(s"=== part files: $nparts")
    spark.stop()
  }
}
