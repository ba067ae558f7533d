package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
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
    import spark.implicits._

    // r17 probe 1: the appendToMinhashIndex lag-flag dedup must SHARE
    // the bn window's (band, band_key) exchange — exactly ONE Exchange
    // in the merged-frame plan (the r16 dropDuplicates shape had two).
    val rows = Seq((1L, 0, 123L, 3), (1L, 0, 123L, 3), (2L, 0, 123L, 3),
      (2L, 1, 77L, 5)).toDF("ref_id", "band", "band_key", "part")
    val wBucket = Window.partitionBy($"band", $"band_key")
    val wOrd = wBucket.orderBy($"ref_id".asc)
    val merged = rows
      .withColumn("dupb", $"ref_id" === lag($"ref_id", 1).over(wOrd))
      .filter(!coalesce($"dupb", lit(false))).drop("dupb")
      .withColumn("bn", count(lit(1)).over(wBucket).cast("int"))
    val p1 = merged.queryExecution.executedPlan.toString
    println(s"=== minhash merged exchanges: ${
      "Exchange".r.findAllIn(p1).size} (want 1)")

    // r17 probe 2: the DEFAULT ivfIndexTopK must keep the PARTIAL
    // WindowGroupLimit below the rank exchange (k-bounded shuffle —
    // the scale plan), and absorbReplays=true must add its lag dedup
    // with the SAME exchange count (the dedup rides the rank window;
    // it forfeits only the partial limit, never adds a shuffle).
    val e = spark.range(64).select($"id".as("vec_id"),
      transform(sequence(lit(0), lit(7)), d =>
        (cos(($"id" % 8 + 1) * (d + 1)) + 0.1).cast("float"))
        .as("embedding"))
    val path = java.nio.file.Files.createTempDirectory("probe_ivf").toString
    graft.operators.VectorOps.buildIvfIndex(e, path, nCentroids = 8,
      iters = 1)
    for (absorb <- Seq(false, true)) {
      val q = graft.operators.VectorOps.ivfIndexTopK(
        e.filter($"vec_id" < 4), path, k = 3, nProbe = 2,
        absorbReplays = absorb)
      q.collect()
      val p2 = q.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(p2).size
      val nPartial = "WindowGroupLimit.*Partial".r.findAllIn(p2).size
      println(s"=== ivfIndexTopK(absorb=$absorb) exchanges: $nEx " +
        s"partial-window-limits: $nPartial" +
        (if (!absorb) " (want >=1 — the k-bounded shuffle)" else ""))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
