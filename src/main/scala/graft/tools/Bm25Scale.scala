package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.BenchMetrics

/**
 * The persisted BM25 index's amortization + decade measurement (r16 —
 * the [[graft.operators.TextOps.buildBm25Index]] counterpart of r14's
 * persisted-ANN table): at sf1 and sf10 of the GenSf documents corpus
 * (50 K → 500 K docs), measure
 *
 *  - the per-batch full recompute ([[graft.operators.TextOps
 *    .bm25TopK]] — re-tokenizes the corpus and re-derives df/avgdl/dl
 *    every query batch),
 *  - the one-time index build,
 *  - the steady-state index query ([[graft.operators.TextOps
 *    .bm25AgainstIndex]] — the pruned-postings path),
 *  - one 1%-increment append (the daily maintenance cost).
 *
 * Warm medians-of-3 for the repeatable paths; build/append timed once
 * (eager, one-shot by nature). BenchMetrics counters ride every
 * number so bytes/jobs adjudicate what wall clock cannot.
 */
object Bm25Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)
    BenchMetrics.install(spark.sparkContext)
    val terms = Seq("hash", "join", "vector")

    for (sf <- Seq(1.0, 10.0)) {
      val dir = s"/tmp/graft_bm25scale/sf$sf"
      val docs = {
        val p = s"$dir/documents.parquet"
        if (!new java.io.File(p).exists())
          GenSf.documentsDf(spark, sf).coalesce(
            math.max(1, (50000 * sf / 50000).toInt))
            .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      val nDocs = docs.count()

      def median3(body: => Unit): BenchMetrics.Rep = {
        BenchMetrics.timed(spark.sparkContext)(body) // warm-up
        val reps = (1 to 3).map(_ =>
          BenchMetrics.timed(spark.sparkContext)(body)).sortBy(_.sec)
        reps(1)
      }
      def show(name: String, r: BenchMetrics.Rep): Unit =
        println(f"sf$sf%-4s $name%-18s sec=${r.sec}%7.2f " +
          f"shuffle_mb=${r.shuffleBytes / 1048576.0}%8.2f " +
          f"jobs=${r.jobs}%4d task_sec=${r.taskMs / 1e3}%7.2f " +
          f"docs=$nDocs%7d")

      val recompute = median3 {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.bm25TopK(docs, terms).count(): Unit
        }
        spark.catalog.clearCache()
      }
      show("bm25TopK(full)", recompute)

      val idx = s"$dir/idx"
      val build = BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.buildBm25Index(docs, idx)
        }
        spark.catalog.clearCache()
      }
      show("buildBm25Index", build)

      val query = median3 {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.bm25AgainstIndex(spark, idx, terms)
            .count(): Unit
        }
        spark.catalog.clearCache()
      }
      show("bm25AgainstIndex", query)

      // the daily increment: 1% fresh docs (ids past the corpus end so
      // dedup semantics don't matter — this times the append machinery)
      val incDir = s"$dir/inc.parquet"
      if (!new java.io.File(incDir).exists())
        GenSf.documentsDf(spark, sf * 1.01)
          .filter(col("doc_id") >= nDocs)
          .write.mode("overwrite").parquet(incDir)
      val inc = spark.read.parquet(incDir)
      val append = BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.appendToBm25Index(inc, idx)
        }
        spark.catalog.clearCache()
      }
      show("append(1%)", append)

      val postQuery = median3 {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.bm25AgainstIndex(spark, idx, terms)
            .count(): Unit
        }
        spark.catalog.clearCache()
      }
      show("query(post-append)", postQuery)
    }
    spark.stop()
  }
}
