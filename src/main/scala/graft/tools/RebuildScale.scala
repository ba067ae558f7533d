package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.BenchMetrics

/**
 * The rebuild lifecycle's cost measurement (r17 — giving
 * [[graft.operators.VectorOps.rebuildIvfIndex]] /
 * [[graft.operators.TextOps.rebuildBm25Index]] the same amortization
 * evidence every other index path carries): at sf1 and sf10 of the
 * GenSf corpora, measure
 *
 *  - the one-time fresh build,
 *  - a 1% append + its VERBATIM REPLAY (planting the at-least-once
 *    duplicates the rebuild purges),
 *  - the rebuild itself (retrain + dedup + staged rewrite + swap) —
 *    the claim under test is "the retrain IS a build": rebuild wall
 *    should sit at build-plus-one-dedup-pass, with the two-rename
 *    swap contributing nothing measurable,
 *  - steady-state probe queries on the rebuilt index, DEFAULT vs
 *    `absorbReplays = true` — quantifying the partial-window-limit
 *    trade the opt-in flag exists for (SCALE.md lesson 17).
 *
 * Build/append/rebuild timed once (eager one-shots); queries warm
 * medians-of-3. BenchMetrics counters on every number.
 */
object RebuildScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)
    BenchMetrics.install(spark.sparkContext)

    def median3(body: => Unit): BenchMetrics.Rep = {
      BenchMetrics.timed(spark.sparkContext)(body) // warm-up
      val reps = (1 to 3).map(_ =>
        BenchMetrics.timed(spark.sparkContext)(body)).sortBy(_.sec)
      reps(1)
    }

    for (sf <- Seq(1.0, 10.0)) {
      val dir = s"/tmp/graft_rebuildscale/sf$sf"
      def show(name: String, r: BenchMetrics.Rep): Unit =
        println(f"sf$sf%-4s $name%-22s sec=${r.sec}%7.2f " +
          f"shuffle_mb=${r.shuffleBytes / 1048576.0}%8.2f " +
          f"jobs=${r.jobs}%4d task_sec=${r.taskMs / 1e3}%7.2f")

      // ---- IVF: build, append+replay, rebuild-from-itself, query A/B
      // 8 files: a 1-file dump serializes every corpus scan (Lloyd at
      // 1-task parallelism) and would flatter the rebuild, whose input
      // is the index's 64 part dirs — keep the comparison layout-fair
      val embP = s"$dir/embeddings.parquet"
      if (!new java.io.File(embP).exists())
        GenSf.embeddingsDf(spark, sf).coalesce(8)
          .write.mode("overwrite").parquet(embP)
      val emb = spark.read.parquet(embP)
      val nVec = emb.count()
      val idx = s"$dir/ivf"
      show("buildIvfIndex", BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.VectorOps.buildIvfIndex(emb, idx,
            nCentroids = 64, iters = 2)
        }
        spark.catalog.clearCache()
      })
      val incP = s"$dir/inc.parquet"
      if (!new java.io.File(incP).exists())
        GenSf.embeddingsDf(spark, sf * 1.01)
          .filter(col("vec_id") >= nVec)
          .coalesce(1).write.mode("overwrite").parquet(incP)
      val inc = spark.read.parquet(incP)
      show("append(1%)", BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.VectorOps.appendToIvfIndex(inc, idx)
        }
        spark.catalog.clearCache()
      })
      show("append(replay)", BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.VectorOps.appendToIvfIndex(inc, idx)
        }
        spark.catalog.clearCache()
      })
      show("rebuildIvfIndex", BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.VectorOps.rebuildIvfIndex(spark, idx)
        }
        spark.catalog.clearCache()
      })
      val probes = emb.filter(col("vec_id") < 64)
      show("query(default)", median3 {
        graft.operators.Caches.scoped {
          graft.operators.VectorOps.ivfIndexTopK(probes, idx, k = 10,
            nProbe = 8).count(): Unit
        }
        spark.catalog.clearCache()
      })
      show("query(absorb)", median3 {
        graft.operators.Caches.scoped {
          graft.operators.VectorOps.ivfIndexTopK(probes, idx, k = 10,
            nProbe = 8, absorbReplays = true).count(): Unit
        }
        spark.catalog.clearCache()
      })

      // ---- BM25: build, append+replay, canonicalizing rebuild
      val docsP = s"$dir/documents.parquet"
      if (!new java.io.File(docsP).exists())
        GenSf.documentsDf(spark, sf).coalesce(8)
          .write.mode("overwrite").parquet(docsP)
      val docs = spark.read.parquet(docsP)
      val nDocs = docs.count()
      val bidx = s"$dir/bm25"
      show("buildBm25Index", BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.buildBm25Index(docs, bidx)
        }
        spark.catalog.clearCache()
      })
      val dincP = s"$dir/docinc.parquet"
      if (!new java.io.File(dincP).exists())
        GenSf.documentsDf(spark, sf * 1.01)
          .filter(col("doc_id") >= nDocs)
          .coalesce(1).write.mode("overwrite").parquet(dincP)
      val dinc = spark.read.parquet(dincP)
      graft.operators.Caches.scoped {
        graft.operators.TextOps.appendToBm25Index(dinc, bidx)
        graft.operators.TextOps.appendToBm25Index(dinc, bidx) // replay
      }
      spark.catalog.clearCache()
      show("rebuildBm25Index", BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.rebuildBm25Index(spark, bidx)
        }
        spark.catalog.clearCache()
      })
      show("query(post-rebuild)", median3 {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.bm25AgainstIndex(spark, bidx,
            Seq("hash", "join", "vector")).count(): Unit
        }
        spark.catalog.clearCache()
      })
    }
    spark.stop()
  }
}
