package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.OmeOps
import graft.schema.{Fixtures, OmeSchema}

/** Scratch driver used by the /verify flow; not part of the library API. */
object VerifyScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fx = Fixtures.conftestDf(spark) // 4x3, 2 channels, pixels 0..23 / 100..123

    println("=== downscale2x on conftest (4x3 -> 2x1) ===")
    OmeOps.describe(OmeOps.downscale2x(fx)).show(false)
    OmeOps.downscale2x(fx)
      .select(explode(col("ome_arrow.planes")).as("p"))
      .select(col("p.t"), col("p.c"), col("p.z"), col("p.pixels")).show(false)

    println("=== downscale2x degenerate size_x==1 ===")
    val thin = Fixtures.syntheticImages(spark, 1, t = 1, c = 1, z = 1, sy = 4, sx = 1)
    OmeOps.downscale2x(thin)
      .select(col("ome_arrow.pixels_meta.size_x"), col("ome_arrow.pixels_meta.size_y"),
        element_at(col("ome_arrow.planes"), 1).getField("pixels").as("pixels"))
      .show(false)
    thin.select(element_at(col("ome_arrow.planes"), 1).getField("pixels").as("orig")).show(false)

    println("=== slice with duplicate (t,c,z): last wins ===")
    // fixture has planes c=0 (0..23) and c=1 (100..123); add a dup c=0 with pixels+1000
    val dup = fx.select(struct(
      col("ome_arrow.type").as("type"), col("ome_arrow.version").as("version"),
      col("ome_arrow.id").as("id"), col("ome_arrow.name").as("name"),
      col("ome_arrow.acquisition_datetime").as("acquisition_datetime"),
      col("ome_arrow.pixels_meta").as("pixels_meta"),
      concat(col("ome_arrow.planes"), array(struct(
        lit(0).as("z"), lit(0).as("t"), lit(0).cast("short").as("c"),
        transform(element_at(col("ome_arrow.planes"), 1).getField("pixels"),
          p => p + 1000).as("pixels")))).as("planes")).as("ome_arrow"))
    OmeOps.sliceOmeArrow(dup, xMin = 1, xMax = 3, yMin = 0, yMax = 2)
      .select(explode(col("ome_arrow.planes")).as("p"))
      .select(col("p.t"), col("p.c"), col("p.z"), col("p.pixels")).show(false)

    println("=== slice fillMissing=false drops, =true zero-fills ===")
    // synthetic 2x2x2 image, remove plane (t=1,c=1,z=1)
    val syn = Fixtures.syntheticImages(spark, 1)
    val holed = syn.select(struct(
      col("ome_arrow.type").as("type"), col("ome_arrow.version").as("version"),
      col("ome_arrow.id").as("id"), col("ome_arrow.name").as("name"),
      col("ome_arrow.acquisition_datetime").as("acquisition_datetime"),
      col("ome_arrow.pixels_meta").as("pixels_meta"),
      filter(col("ome_arrow.planes"), p =>
        !(p.getField("t") === 1 && p.getField("c") === 1 && p.getField("z") === 1))
        .as("planes")).as("ome_arrow"))
    println("fillMissing=true -> 8 planes, hole zero-filled:")
    OmeOps.sliceOmeArrow(holed, 0, 4, 0, 4)
      .select(size(col("ome_arrow.planes")).as("n_planes"),
        aggregate(element_at(col("ome_arrow.planes"), 8).getField("pixels"),
          lit(0L), (a, b) => a + b).as("last_plane_pxsum")).show(false)
    println("fillMissing=false -> 7 planes:")
    OmeOps.sliceOmeArrow(holed, 0, 4, 0, 4, fillMissing = false)
      .select(size(col("ome_arrow.planes")).as("n_planes")).show(false)

    println("=== explode -> nest lossless round-trip ===")
    val orig = Fixtures.syntheticImages(spark, 3)
    val rt = OmeOps.nestPlanes(OmeOps.explodePlanes(orig))
    val a = orig.select(to_json(col("ome_arrow")).as("j"))
    val b = rt.select(to_json(col("ome_arrow")).as("j"))
    println(s"round-trip diff rows: ${a.exceptAll(b).count()} + ${b.exceptAll(a).count()} (want 0 + 0)")

    println("=== strideDownsample k=2 on 4x4x z=2 ===")
    val s4 = Fixtures.syntheticImages(spark, 1, t = 1, c = 1, z = 2, sy = 4, sx = 4)
    OmeOps.strideDownsample(s4, 2)
      .select(col("ome_arrow.pixels_meta.size_x"), col("ome_arrow.pixels_meta.size_y"),
        col("ome_arrow.pixels_meta.size_z"), size(col("ome_arrow.planes")).as("n_planes"),
        element_at(col("ome_arrow.planes"), 1).getField("pixels").as("pixels0"))
      .show(false)
    s4.select(element_at(col("ome_arrow.planes"), 1).getField("pixels").as("orig0")).show(false)

    println("=== percentileContrast on conftest c=1 (100..123) ===")
    OmeOps.percentileContrast(fx, c = 1).show(false)
    println("=== percentileContrast on absent channel c=5 (want nulls) ===")
    OmeOps.percentileContrast(fx, c = 5).show(false)

    println("=== toDense keyed lookup on holed record (hole zero-filled) ===")
    OmeOps.toDense(holed)
      .select(col("id"), size(col("dense")).as("n"),
        aggregate(col("dense"), lit(0L), (a2, b2) => a2 + b2).as("sum")).show(false)
    OmeOps.toDense(syn)
      .select(col("id"), size(col("dense")).as("n"),
        aggregate(col("dense"), lit(0L), (a2, b2) => a2 + b2).as("sum")).show(false)

    spark.stop()
  }
}
