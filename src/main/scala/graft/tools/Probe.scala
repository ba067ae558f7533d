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

    // r15 probe: where do the 4096-cell ivfIndexTopK probe seconds go?
    // Stage the operator's internals with separate timers.
    val path = "/tmp/graft_ivfcellscale/c4096"
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"=== $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val emb = spark.range(20000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        cos((col("id") % 64 + 1) * (d + 1)).cast("float")).as("embedding"))
    val probes = emb.filter(col("vec_id") < 16)
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep")
      val cents = t("read centroids")(
        spark.read.parquet(s"$path/centroids"))
      t("centroids count")(cents.count())
      val listed = t("vectors listing (read+count)")(
        spark.read.parquet(s"$path/vectors").count())
      println(s"=== vectors rows: $listed")
      val q = t("ivfIndexTopK plan+collect")(
        graft.operators.VectorOps.ivfIndexTopK(probes, path, k = 5))
      t("result count")(q.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
