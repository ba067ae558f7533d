package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.BenchMetrics
import graft.operators.{Caches, TextOps}

/**
 * VERDICT r19 #7: the bench sessions set
 * `spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold = 64m`
 * (AQE's runtime sort-merge → shuffled-hash conversion) but no
 * measurement existed where the conversion actually FIRES — at sf0.1
 * every convertible join demotes to broadcast first, so the config was
 * evidence-free where it ships. This probe constructs the firing
 * regime with a REAL registry operator at sf1: EXACT-mode
 * ngramJaccardPairs over GenSf sf1 documents — its candidate join and
 * set-verification joins read cached frames partitioned on OTHER keys
 * (doc rank / scan order), so real exchanges feed the joins, the
 * shuffled sides (tens of MB) sit past the 10 MB runtime broadcast
 * threshold, and the post-shuffle partitions sit well under 64 MB.
 * (First probe attempt used the CAPPED posting self-join — it cannot
 * fire: both sides read one cached frame that already carries
 * hashpartitioning(shingle) from the cap window, so the join plans
 * with NO shuffle stages and AQE has nothing to convert; that
 * negative result is kept in SCALE.md.) Runs under bound 0 (Spark
 * default: conversion off) and bound 64m, and reports the FINAL
 * adaptive plan's join strategies plus the usual counters.
 *
 * Spark applies the threshold only when it is >=
 * `spark.sql.adaptive.advisoryPartitionSizeInBytes` (default 64m), so
 * sub-64m bounds silently disable the conversion rather than bounding
 * tighter (ADVICE r19) — the probe pins advisory explicitly so the
 * 64m/64m pairing is what is measured.
 */
object ShjProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(1.0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    BenchMetrics.install(spark.sparkContext)

    val dir = s"/tmp/graft_shjprobe/sf$sf"
    val docsP = s"$dir/documents.parquet"
    if (!new java.io.File(docsP).exists())
      GenSf.documentsDf(spark, sf).coalesce(8)
        .write.mode("overwrite").parquet(docsP)
    val docs = spark.read.parquet(docsP)

    for (bound <- Seq("0", "64m")) {
      spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", bound)
      // warm-up + median-of-3, plan captured from the LAST rep's frame
      var planStr = ""
      def once(): BenchMetrics.Rep =
        BenchMetrics.timed(spark.sparkContext) {
          Caches.scoped {
            val df = TextOps.ngramJaccardPairs(docs)
            // execute THIS queryExecution (df.count() would plan its own
            // wrapper execution and leave df's adaptive plan unfinalized
            // — isFinalPlan=false showed the initial SMJs, not the
            // runtime decision)
            df.queryExecution.toRdd.count(): Unit
            planStr = df.queryExecution.executedPlan.toString
          }
          spark.catalog.clearCache()
        }
      once()
      val reps = (1 to 3).map(_ => once()).sortBy(_.sec)
      val r = reps(1)
      val shj = "ShuffledHashJoin".r.findAllIn(planStr).length
      val smj = "SortMergeJoin".r.findAllIn(planStr).length
      val bhj = "BroadcastHashJoin".r.findAllIn(planStr).length
      println(f"sf$sf bound=$bound%-4s sec=${r.sec}%7.2f " +
        f"shuffle_mb=${r.shuffleBytes / 1048576.0}%9.2f jobs=${r.jobs}%3d " +
        f"task_sec=${r.taskMs / 1e3}%7.2f " +
        f"joins: SHJ=$shj SMJ=$smj BHJ=$bhj")
      val planOut = s"/tmp/shjprobe_sf${sf}_bound$bound.txt"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(planOut), planStr)
      println(s"  final adaptive plan -> $planOut")
    }
    spark.stop()
  }
}
