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

    println("=== profileColumns on sf0.01 lineitem ===")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val prof = graft.operators.ProfileOps.profileColumns(li,
      Seq("l_returnflag", "l_quantity", "l_shipdate"))
    prof.orderBy(col("col_name")).show(truncate = false)
    println("=== profile plan (expect one (col,v) hash agg + rollup, ReadSchema pruned to 3 cols) ===")
    prof.explain("formatted")

    println("=== kAnonymity on sf0.01 customer ===")
    val cust = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    graft.operators.ProfileOps.kAnonymity(cust,
      Seq("c_nationkey", "c_mktsegment"), 5).show(truncate = false)

    println("=== entityPairs on sf0.01 part ===")
    val part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    val pairs = graft.operators.ProfileOps.entityPairs(part, "p_name", 3, 200)
    pairs.orderBy(col("name_a"), col("name_b")).show(8, truncate = false)
    println(s"pairs total: ${pairs.count()}")

    println("=== augmentPlanes on corpus4d (rot90 head) ===")
    val planes = graft.operators.OmeOps.explodePlanes(
      graft.schema.Fixtures.corpus4d(spark))
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("size_x"), col("size_y"), col("pixels"))
    val aug = graft.operators.OmeOps.augmentPlanes(planes,
      Seq("hflip", "rot90", "transpose"))
    aug.filter(col("aug") === "rot90")
      .orderBy(col("image_id"), col("t"), col("c"), col("z"))
      .show(2, truncate = false)
    println("=== augment plan (expect union of narrow projections, graft_pixel_permute inside WholeStageCodegen, no exchange) ===")
    aug.explain("formatted")
    spark.stop()
  }
}
