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

    // r16 probe: the persisted-BM25 query plans — shuffle/broadcast
    // census + the pruned scan, for SCALE.md's plan-audit table
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val path = "/tmp/graft_probe_bm25"
    graft.operators.TextOps.buildBm25Index(docs, path)
    def census(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val bcasts = "BroadcastExchange".r.findAllIn(p).length
      val shuffles = "Exchange".r.findAllIn(p).length - bcasts
      val pushed = "PushedFilters: [^\n]+".r.findFirstIn(p).getOrElse("-")
      val pf = "PartitionFilters: [^\n]+".r.findFirstIn(p).getOrElse("-")
      val takeOrdered = p.contains("TakeOrderedAndProject")
      println(s"=== $name: shuffles=$shuffles broadcasts=$bcasts " +
        s"takeOrdered=$takeOrdered")
      println(s"===   $pf")
      println(s"===   $pushed")
    }
    census("bm25AgainstIndex", graft.operators.TextOps.bm25AgainstIndex(
      spark, path, Seq("hash", "join", "vector"), kTop = 20))
    import spark.implicits._
    val bags = Seq((0L, Seq("hash", "join")), (1L, Seq("vector")))
      .toDF("query_id", "terms")
    census("bm25BatchAgainstIndex",
      graft.operators.TextOps.bm25BatchAgainstIndex(bags, path, kTop = 10))
    census("ivfIndexStats readSchema check", {
      val ipath = "/tmp/graft_probe_ivf"
      graft.operators.VectorOps.buildIvfIndex(
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet"),
        ipath, nCentroids = 16, iters = 1)
      graft.operators.VectorOps.ivfIndexStats(spark, ipath)
    })
    // the stats scan must read ONLY cluster (+ the part key)
    val st = graft.operators.VectorOps.ivfIndexStats(
      spark, "/tmp/graft_probe_ivf")
    "ReadSchema: [^\n]+".r.findAllIn(
      st.queryExecution.executedPlan.toString).foreach(s =>
      println(s"=== ivfIndexStats $s"))
    spark.stop()
  }
}
