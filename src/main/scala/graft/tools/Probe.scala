package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Scratch driver for one-off probes (see .claude/skills/verify). */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // r14 probe: the VERDICT r13 #3 equality cert at corpus scale —
    // the sf1 near-dup pair graph clustered by driver union-find vs
    // the alternating-star distributed path, certified row-identical.
    val root = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/tmp/graft_sweep")
    val docs = spark.read.parquet(s"$root/sf1.0/documents.parquet")
    val pairs = graft.operators.Caches.scoped {
      val p = TextOps.nearDupPairs(docs, threshold = 0.8)
        .select(col("doc_a"), col("doc_b"))
      p.persist()
      println(s"=== sf1 dup graph: ${p.count()} edges")
      p.localCheckpoint(true)
    }
    val t0 = System.nanoTime()
    val viaDriver = TextOps.connectedComponents(pairs)
    val nDriver = viaDriver.count()
    val tDriver = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val viaStar = TextOps.connectedComponents(pairs, driverEdgeLimit = 0)
    val nStar = viaStar.count()
    val tStar = (System.nanoTime() - t1) / 1e9
    val cols = Seq("doc_id", "cluster_id", "cluster_size", "is_keeper")
    val diff = viaDriver.exceptAll(viaStar).count() +
      viaStar.exceptAll(viaDriver).count()
    println(f"=== driver union-find: $nDriver rows in $tDriver%.1f s; " +
      f"star contraction: $nStar rows in $tStar%.1f s; " +
      s"row diff (exceptAll both ways over $cols): $diff")
    println(if (diff == 0 && nDriver == nStar)
      "=== EQUALITY CERT PASS" else "=== EQUALITY CERT FAIL")
    spark.stop()
  }
}
