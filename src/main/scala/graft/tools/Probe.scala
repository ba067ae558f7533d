package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.OmeOps
import graft.schema.Fixtures
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Seq[String] =
      OmeOps.downscalePlanes(OmeOps.cropPlanes(
        OmeOps.explodePlanes(Fixtures.corpus4d(spark)), 2, 6, 1, 7))
        .select(col("image_id"), col("t"), col("c"), col("z"), col("pixels"))
        .orderBy(col("image_id"), col("t"), col("c"), col("z"))
        .collect().map(_.toString).toSeq
    val withCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted = run()
    println("rows: " + withCodegen.length)
    println("codegen == interpreted eval: " + (withCodegen == interpreted))
    println("sample: " + withCodegen.head.take(120))
    spark.stop()
  }
}
