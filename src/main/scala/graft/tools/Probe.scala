package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.OmeOps
import graft.schema.Fixtures
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pipeline(n: Int): Long = {
      val corpus = Fixtures.syntheticImages(spark, n, t = 7, c = 3, z = 5,
        sy = 64, sx = 64, prefix = "big")
      OmeOps.downscalePlanes(OmeOps.cropPlanes(
        OmeOps.explodePlanes(corpus), 8, 56, 8, 56))
        .select(aggregate(col("pixels"), lit(0L), (a, v) => a + v))
        .count()
    }
    pipeline(8) // warmup (codegen + JIT)
    for (n <- Seq(32, 128, 512, 1024)) {
      val t0 = System.nanoTime()
      val rows = pipeline(n)
      println(f"n=$n%5d images (${n * 105}%6d planes): ${(System.nanoTime() - t0) / 1e9}%6.2f s ($rows rows)")
    }
    spark.stop()
  }
}
