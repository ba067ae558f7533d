package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for one-off plan/behavior probes (see .claude/skills). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    println("=== cast(date) filter ===")
    li.filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date"))
      .select(col("l_extendedprice")).explain("formatted")
    println("=== ntz literal filter ===")
    li.filter(col("l_shipdate") >=
        lit(java.time.LocalDateTime.of(1996, 1, 1, 0, 0)))
      .select(col("l_extendedprice")).explain("formatted")
    spark.stop()
  }
}
