package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    graft.functions.ensureRegistered(spark)
    val df = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f, 9.0f))).toDF("a", "b")
    println("--- mismatched-length vectors ---")
    df.select(
      VectorOps.cosine6(col("a"), col("b")).as("native"),
      VectorOps.cosine6Columnar(col("a"), col("b")).as("columnar")).show()
    spark.stop()
  }
}
