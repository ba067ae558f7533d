package graft.tools
import org.apache.spark.sql.SparkSession
import graft.operators.OmeOps
import graft.schema.Fixtures
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // bigger corpus than the unit test: 8 images x 105 planes of 64x64
    val corpus = Fixtures.syntheticImages(spark, 8, t = 7, c = 3, z = 5,
      sy = 64, sx = 64)
    println("--- exact vs approx on 8 x (7,3,5,64,64) images, c=1 ---")
    val exact = OmeOps.percentileContrast(corpus, c = 1).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("clim_low"), r.getAs[Double]("clim_high"))).toMap
    val approx = OmeOps.percentileContrastApprox(corpus, c = 1).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("clim_low"), r.getAs[Double]("clim_high"))).toMap
    val maxDiff = exact.keys.map(k => math.max(
      math.abs(exact(k)._1 - approx(k)._1), math.abs(exact(k)._2 - approx(k)._2))).max
    println(f"images=${exact.size} maxAbsDiff=$maxDiff%.3f (volume 20480 px/image)")
    val plan = OmeOps.percentileContrastApprox(corpus, c = 1)
      .queryExecution.executedPlan.toString
    println("shuffles: " + ("Exchange".r.findAllIn(plan).length -
      "BroadcastExchange".r.findAllIn(plan).length))
    println("partial agg before shuffle: " + plan.contains("partial_percentile_approx"))
    println("--- absent channel c=9 ---")
    println("rows: " + OmeOps.percentileContrastApprox(corpus, c = 9).count() + " (want 0)")
    spark.stop()
  }
}
