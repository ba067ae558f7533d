package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.OmeArrow
import graft.operators.OmeOps
import graft.schema.Fixtures
import graft.sources.{OmeParquet, OmeStack, OmeTiff}

/** End-to-end drive of the source/sink layer against the reference's own
  * test corpus (read-only) and synthetic fixtures. */
object SourcesScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println("=== O6: read reference-format parquet fixture ===")
    val ref = OmeParquet.read(spark, "/root/repo/src/test/resources/reference_conftest.parquet")
    println("strict schema match: " + OmeOps.verifySchema(ref, strict = true))
    OmeOps.describe(ref).select(col("id"), col("summary")).show(false)
    ref.select(col("ome_arrow.acquisition_datetime"),
      element_at(col("ome_arrow.planes"), 2).getField("pixels").as("c1_pixels"),
      element_at(col("ome_arrow.pixels_meta.channels"), 2).getField("color_rgba")).show(false)

    println("=== O10+O6: write/read round-trip with detection (column 'image') ===")
    OmeParquet.write(Fixtures.mixedCorpus(spark), "/tmp/graft_rt", columnName = "image",
      fileMetadata = Map("origin" -> "graft-test"))
    val back = OmeParquet.read(spark, "/tmp/graft_rt")
    println("roundtrip describe diff: " +
      OmeOps.describe(back).exceptAll(OmeOps.describe(Fixtures.mixedCorpus(spark))).count())
    println("sidecar: " + OmeParquet.readMetadata(spark, "/tmp/graft_rt"))

    println("=== O3: reference OME-TIFF corpus (artificial-5d) ===")
    val d5 = "/root/reference/tests/data/ome-artificial-5d-datasets"
    for (f <- Seq("z-series.ome.tiff", "time-series.ome.tif", "single-channel.ome.tiff",
        "multi-channel.ome.tiff", "multi-channel-z-series.ome.tiff",
        "multi-channel-time-series.ome.tiff", "4D-series.ome.tiff")) {
      try {
        val df = OmeTiff.read(spark, s"$d5/$f")
        val s = OmeOps.describe(df).select(col("summary")).collect()(0).getString(0)
        println(f"$f%-40s -> $s")
      } catch { case e: Throwable => println(s"$f FAILED: ${e.getMessage.take(160)}") }
    }

    println("=== O3: examplehuman (PackBits + uncompressed) ===")
    for (f <- Seq("AS_09125_050116030001_D03f00d0.tif", "AS_09125_050116030001_D03f00d2.tif")) {
      val df = OmeTiff.read(spark, s"/root/reference/tests/data/examplehuman/$f")
      val r = OmeOps.describe(df).select(col("summary")).collect()(0).getString(0)
      val stats = OmeOps.planeStats(df, 0, 0, 0).select(col("px_min"), col("px_max"), col("px_sum")).collect()(0)
      println(f"$f%-40s -> $r  px[min=${stats.getInt(0)},max=${stats.getInt(1)},sum=${stats.getLong(2)}]")
    }

    println("=== O4: nviz pattern ingest (3 golden cases) ===")
    val nviz = "/root/reference/tests/data/nviz-artificial-4d-dataset"
    for (pat <- Seq("E99_C<111,222>_ZS<000-021>.tif", "E99_C111_ZS<000-021>.tif",
        "E99_C<111,222>_ZS000.tif")) {
      val df = OmeStack.readPattern(spark, s"$nviz/$pat")
      val row = OmeOps.describe(df).select(col("summary")).collect()(0)
      val chans = df.select(transform(col("ome_arrow.pixels_meta.channels"),
        c => c.getField("name"))).collect()(0).getSeq[String](0)
      println(f"$pat%-32s -> ${row.getString(0)}  channels=${chans.mkString(",")}")
    }

    println("=== O8: TIFF export -> re-ingest round-trip ===")
    OmeTiff.write(Fixtures.mixedCorpus(spark), "/tmp/graft_tiff_out")
    val reread = OmeTiff.read(spark, "/tmp/graft_tiff_out")
    val a = OmeOps.describe(Fixtures.mixedCorpus(spark))
      .drop("id").orderBy(col("summary"))
    val b = OmeOps.describe(reread).drop("id").orderBy(col("summary"))
    println("tiff roundtrip describe diff: " + a.exceptAll(b).count() + " / " + b.exceptAll(a).count())
    // pixel integrity through TIFF: compare px sums per (t,c,z) of one image
    val orig1 = Fixtures.corpus4d(spark).filter(col("ome_arrow.id") === "i4d-0001")
    OmeTiff.write(orig1, "/tmp/graft_one.ome.tiff")
    val back1 = OmeTiff.read(spark, "/tmp/graft_one.ome.tiff")
    def sums(df: org.apache.spark.sql.DataFrame) =
      OmeOps.explodePlanes(df).select(col("t"), col("c"), col("z"),
        aggregate(col("pixels"), lit(0L), (x, v) => x + v).as("s"))
        .orderBy(col("t"), col("c"), col("z")).collect().toSeq.map(_.toString)
    println("single-file pixel sums equal: " + (sums(orig1) == sums(back1)))

    println("=== O16: polymorphic dispatch ===")
    println("parquet suffix: rows=" + OmeArrow.read(spark,
      "/root/repo/src/test/resources/reference_conftest.parquet").count())
    println("tiff suffix: rows=" + OmeArrow.read(spark, s"$d5/z-series.ome.tiff").count())
    println("pattern: rows=" + OmeArrow.read(spark, s"$nviz/E99_C<111,222>_ZS000.tif").count())
    try OmeArrow.read(spark, "/tmp/what.xyz")
    catch { case e: IllegalArgumentException => println("unknown suffix -> " + e.getMessage.take(80)) }
    spark.stop()
  }
}
