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

    // r19 probe: where do the index-exact bytes live after the sig
    // denormalization? Per-exchange shuffle-write breakdown of
    // simhashAgainstIndex at sf10 (SimhashScale leaves the fixtures
    // on disk; the tool's last op retunes the index to bands=8).
    val dir = "/tmp/graft_shscale/sf10.0"
    val inc = spark.read.parquet(s"$dir/inc.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val idx4 = s"$dir/idx4"
    if (!new java.io.File(idx4).exists())
      graft.operators.TextOps.buildSimhashIndex(docs, idx4)
    graft.BenchMetrics.install(spark.sparkContext)
    def rep(name: String)(body: => Long): Unit = {
      val r = graft.BenchMetrics.timed(spark.sparkContext) { body: Unit }
      println(f"=== $name sec=${r.sec}%7.2f mb=${
        r.shuffleBytes / 1048576.0}%8.2f jobs=${r.jobs} task_s=${
        r.taskMs / 1e3}%7.1f")
      spark.catalog.clearCache()
    }
    rep("index-exact")(graft.operators.Caches.scoped {
      graft.operators.TextOps.simhashAgainstIndex(
        inc, idx4, maxHamming = 10).count() })
    rep("index-exact(2keys)")(graft.operators.Caches.scoped {
      graft.operators.TextOps.simhashAgainstIndex(
        inc, idx4, maxHamming = 10)
        .dropDuplicates(Seq("doc_id", "ref_id")).count() })
    rep("direct-exact")(graft.operators.Caches.scoped {
      graft.operators.TextOps.simhashPairs(
        docs.select(col("doc_id"), col("text")).unionByName(
          inc.select(col("doc_id"), col("text"))), maxHamming = 10)
        .count() })
    val q = graft.operators.TextOps.simhashAgainstIndex(
      inc, idx4, maxHamming = 10)
    q.count()
    val plan = q.queryExecution.executedPlan
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.exchange
            .ShuffleExchangeExec =>
          println(s"=== shuffle child=${s.child.nodeName} metrics: " +
            s.metrics.toSeq.sortBy(_._1).map { case (k, m) =>
              s"$k=${m.value}" }.mkString(" "))
        case b: org.apache.spark.sql.execution.exchange
            .BroadcastExchangeExec =>
          println(s"=== broadcast exchange child=${b.child.nodeName}")
        case _ => ()
      }
      p.children.foreach(walk)
      p match {
        case q2: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q2.plan)
        case _ => ()
      }
    }
    walk(plan)
    println("=== join nodes: " +
      plan.toString.linesIterator.filter(l =>
        l.contains("Join")).map(_.trim.take(80)).mkString(" | "))
    spark.stop()
  }
}
