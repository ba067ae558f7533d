package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch driver for one-off probes (see .claude/skills/verify). */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)

    // r16 probe: does the TrackScale corpus really contain division
    // and merge events? (The SCALE.md decade section claims them by
    // construction; count them empirically on a 2-movie slice.)
    val k = 40; val tF = 50; val half = tF / 2
    val base = spark.range(2L * tF * k).select(
      format_string("trk-%06d", (col("id") / (tF * k)).cast("int"))
        .as("image_id"),
      lit(0).as("c"), lit(0).as("z"),
      ((col("id") / k) % tF).cast("int").as("t"),
      (col("id") % k).cast("int").as("lane"))
    val alive = base.filter(!(col("lane") % 8 === 4 && col("t") >= half))
    val merging = col("lane") % 8 === 4 && col("t") === half - 1
    val positioned = alive.select(col("image_id"), col("c"), col("z"),
      col("t"), col("lane").as("label"),
      when(merging, (col("lane") - 1) * 10.0 + 2.0)
        .otherwise(col("lane") * 10.0).as("cy"),
      when(merging, col("t") + (col("lane") - 1) % 7 + 1.0)
        .otherwise((col("t") + col("lane") % 7).cast("double")).as("cx"))
    val children = base.filter(col("lane") % 8 === 0 && col("t") >= half)
      .select(col("image_id"), col("c"), col("z"), col("t"),
        (col("lane") + k).as("label"),
        (col("lane") * 10.0 + 1.0).as("cy"),
        (col("t") + col("lane") % 7).cast("double").as("cx"))
    val corpus = positioned.unionByName(children)
    val ev = graft.operators.OmeOps.trackEvents(corpus, maxDisp = 3.0)
    ev.agg(
      sum(col("is_division_child").cast("long")).as("divisions"),
      sum(col("is_merge_child").cast("long")).as("merges"))
      .collect().foreach(r =>
        println(s"=== trackscale 2-movie corpus: divisions=${r.get(0)} " +
          s"merges=${r.get(1)} (expect 5 x 2 of each)"))
    spark.stop()
  }
}
