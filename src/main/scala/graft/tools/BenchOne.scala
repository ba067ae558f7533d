package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single registered query:
  * runMain graft.tools.BenchOne <name> [sfDir] [reps] [cpus]
  * Default cpus=4 mirrors the driver's bench config (BASELINE.md:24);
  * pass 32 for the full local[32] box. Clears the cache before rep 1 so
  * rep 1 is the bench's post-clearCache cold rep and later reps show
  * the in-query cache reuse, exactly like Bench's timed loop. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = if (args.length > 3) args(3) else "4"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // mirror Bench's AQE shuffled-hash conversion bound (see Bench;
      // NOTE: only applied when >= advisoryPartitionSizeInBytes, 64m
      // default — sub-64m values silently disable, ADVICE r19)
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_BOUND", "64m"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // untimed warm-up, like Bench's first pass
    spark.catalog.clearCache()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"$name rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
