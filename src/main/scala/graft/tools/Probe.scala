package graft.tools

import org.apache.spark.sql.SparkSession

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
    graft.BenchMetrics.install(spark.sparkContext)

    // r19 probe: does the AQE sort-merge -> shuffled-hash conversion
    // (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold) fire on
    // the ngram posting self-join, and what does it buy? Interleaved
    // reps to average box noise; final-plan join nodes printed.
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("near_dup_ngram")
    def joins(df: org.apache.spark.sql.DataFrame): String = {
      val txt = df.queryExecution.executedPlan.toString
      Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        .map(n => s"$n=${txt.sliding(n.length).count(_ == n)}")
        .mkString(" ")
    }
    def once(bound: String): Unit = {
      spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", bound)
      val df = fn(spark, sfDir)
      val r = graft.BenchMetrics.timed(spark.sparkContext) {
        df.count(): Unit
      }
      println(f"=== bound=$bound%-4s sec=${r.sec}%6.2f mb=${
        r.shuffleBytes / 1048576.0}%8.2f jobs=${r.jobs} joins=${joins(df)}")
      spark.catalog.clearCache()
    }
    once("0") // untimed-ish warm-up pair (JIT)
    once("64m")
    for (_ <- 1 to 3) { once("0"); once("64m") }
    spark.stop()
  }
}
