package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.BenchMetrics
import graft.operators.{Caches, LayoutOps, VectorOps}

/**
 * Pointer-publish vs rename-swap rebuild, head to head (r18 — giving
 * [[graft.operators.LayoutOps.withPointerGeneration]] the same
 * measured evidence the r17 rebuild lifecycle carries): at sf1/sf10
 * of the GenSf embeddings, build IDENTICAL replayed-append IVF
 * indexes under both publish protocols and measure
 *
 *  - `rebuildIvfIndex` (stage at sibling + two renames) vs
 *    `rebuildIvfIndexPointer` (new generation + one pointer write) —
 *    the claim under test: the publish step is metadata either way,
 *    so the pointer protocol costs NOTHING over the swap while
 *    working on stores with no atomic rename,
 *  - `resolveIndexPointer` ×100 — the per-open read-side overhead
 *    (two tiny object reads + two listings; zero Spark jobs),
 *  - answer equality through both protocols (same corpus, same
 *    deterministic trainer → identical probe answers).
 */
object PointerScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)
    BenchMetrics.install(spark.sparkContext)

    for (sf <- Seq(1.0, 10.0)) {
      val dir = s"/tmp/graft_ptrscale/sf$sf"
      def show(name: String, r: BenchMetrics.Rep): Unit =
        println(f"sf$sf%-4s $name%-22s sec=${r.sec}%7.2f " +
          f"shuffle_mb=${r.shuffleBytes / 1048576.0}%8.2f " +
          f"jobs=${r.jobs}%4d task_sec=${r.taskMs / 1e3}%7.2f")

      val embP = s"$dir/embeddings.parquet"
      if (!new java.io.File(embP).exists())
        GenSf.embeddingsDf(spark, sf).coalesce(8)
          .write.mode("overwrite").parquet(embP)
      val emb = spark.read.parquet(embP)
      val nVec = emb.count()
      val incP = s"$dir/inc.parquet"
      if (!new java.io.File(incP).exists())
        GenSf.embeddingsDf(spark, sf * 1.01)
          .filter(col("vec_id") >= nVec)
          .coalesce(1).write.mode("overwrite").parquet(incP)
      val inc = spark.read.parquet(incP)

      // identical dirty state under both protocols: build + 1% append
      // + its verbatim replay
      val idxSwap = s"$dir/ivf_swap"
      val root = s"$dir/ivf_ptr"
      Caches.scoped {
        VectorOps.buildIvfIndex(emb, idxSwap, nCentroids = 64, iters = 2)
        VectorOps.appendToIvfIndex(inc, idxSwap)
        VectorOps.appendToIvfIndex(inc, idxSwap)
        val gen1 = LayoutOps.withPointerGeneration(spark, root)(g =>
          VectorOps.buildIvfIndex(emb, g, nCentroids = 64, iters = 2))
        VectorOps.appendToIvfIndex(inc, gen1)
        VectorOps.appendToIvfIndex(inc, gen1)
      }
      spark.catalog.clearCache()

      show("rebuild(swap)", BenchMetrics.timed(spark.sparkContext) {
        Caches.scoped { VectorOps.rebuildIvfIndex(spark, idxSwap) }
        spark.catalog.clearCache()
      })
      show("rebuild(pointer)", BenchMetrics.timed(spark.sparkContext) {
        Caches.scoped { VectorOps.rebuildIvfIndexPointer(spark, root) }
        spark.catalog.clearCache()
      })
      show("resolve x100", BenchMetrics.timed(spark.sparkContext) {
        (1 to 100).foreach(_ =>
          LayoutOps.resolveIndexPointer(spark, root): Unit)
      })

      val probes = emb.filter(col("vec_id") < 64)
      def answers(path: String) = Caches.scoped {
        VectorOps.ivfIndexTopK(probes, path, k = 10, nProbe = 8)
          .orderBy("probe_id", "rnk").collect().toSeq
      }
      val eq = answers(idxSwap) ==
        answers(LayoutOps.resolveIndexPointer(spark, root))
      spark.catalog.clearCache()
      println(s"sf$sf answers_equal_across_protocols=$eq")
    }
    spark.stop()
  }
}
