package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{LayoutOps, OmeOps, VectorOps}
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

    // r11 probe 1: partition-aware compaction on a two-level layout
    val dir = "/tmp/probe_compact/table"
    import spark.implicits._
    (0L until 5000L).map(i => (i, s"p $i", s"d${i % 3}"))
      .toDF("id", "s", "day").repartition(30)
      .write.partitionBy("day").mode("overwrite").parquet(dir)
    val (nb, na) = time("compactParquet partitioned") {
      LayoutOps.compactParquet(spark, dir, targetBytes = 512L * 1024)
    }
    println(s"=== compact: $nb -> $na files; " +
      s"rows=${spark.read.parquet(dir).count()}; " +
      s"pruned d0=${spark.read.parquet(dir).filter(col("day") === "d0").count()}")

    // r11 probe 2: banded perceptual hash pairs on the textured corpus
    val planes = OmeOps.explodePlanes(Fixtures.texturedCorpus(spark))
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("size_x"), col("size_y"), col("pixels"))
    val banded = time("phash banded") {
      OmeOps.perceptualHashPairs(planes, maxHamming = 5).count()
    }
    val exact = time("phash exhaustive") {
      OmeOps.perceptualHashPairs(planes, maxHamming = 5,
        exhaustive = true).count()
    }
    println(s"=== phash pairs: banded=$banded exhaustive=$exact " +
      s"equal=${banded == exact}")

    // r11 probe 3: ANN-fed bitext margin vs exhaustive on sf0.01
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val ann = time("bitext_margin_ann") {
      VectorOps.bitextMarginAnn(emb.filter(col("label") === 0),
        emb.filter(col("label") === 1), k = 4, nCentroids = 16).collect()
    }
    val full = time("bitext_margin exhaustive") {
      VectorOps.bitextMargin(emb.filter(col("label") === 0),
        emb.filter(col("label") === 1), k = 4).collect()
    }
    val annBest = ann.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullBest = full.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = annBest.count { case (a, b) => fullBest.get(a).contains(b) }
    println(s"=== bitext: ann rows=${ann.length} full rows=${full.length} " +
      s"best-match agreement=$agree/${fullBest.size}")
    spark.catalog.clearCache()

    // r11 probe 4: bucketed plane table -> zero-exchange nest
    LayoutOps.writePlanesBucketed(
      OmeOps.explodePlanes(Fixtures.mixedCorpus(spark)),
      "probe_b_planes", "/tmp/probe_bucketed/planes", 8)
    val nested = OmeOps.nestPlanes(spark.table("probe_b_planes"))
    val p = nested.queryExecution.executedPlan.toString
    val shuffles = "Exchange".r.findAllIn(p).length -
      "BroadcastExchange".r.findAllIn(p).length
    println(s"=== bucketed nest: rows=${nested.count()} shuffles=$shuffles")
    nested.explain("formatted")

    spark.stop()
  }
}
