package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: measures representative registry queries at every
  * testdata scale factor (sf0.001 / sf0.01 / sf0.1 — 100x of input
  * growth) so SCALE.md's 100 TB story has MEASURED growth curves, not
  * just plan-shape audits (VERDICT r8 #4).
  *
  * Methodology matches Bench: per (sf, query) one untimed warm-up rep,
  * then median of 3 timed reps; operator-internal caches scoped per
  * query so nothing leaks across cells. Queries chosen to cover the
  * operator families that read the sf tables (relational agg/join,
  * exact + LSH dedup, n-gram contamination, LM scoring, retrieval,
  * ANN, events) — the Fixtures-synthetic OME queries scale by image
  * count, measured separately in [[ScalePoints]].
  */
object SfSweep {
  val Queries: Seq[String] = Seq(
    "q1_agg", "q18_large_orders", "dedup_exact", "near_dup_minhash",
    "near_dup_clusters_minhash", "contamination", "bloom_decontam",
    "lm_perplexity", "bm25_topk", "tfidf_topk", "embed_topk",
    "embed_ann_ivfpq", "events_rollup", "events_sessions",
    // r9 additions: trained-model, topic, as-of surface, skew report
    "quality_classifier", "topic_report", "embed_ann_ivf_trained",
    "events_asof_nearest", "events_key_skew",
    // r9-late additions: profiling, linkage, split, PIT join, windows
    "profile_table", "zipf_report", "dataset_split", "entity_pairs",
    "entity_triangles", "pit_features", "q_running_revenue")

  val Sfs: Seq[String] = Seq("sf0.001", "sf0.01", "sf0.1")

  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def cell(name: String, sfDir: String): Double =
      graft.operators.Caches.scoped {
        val q = graft.SparkEntry.queries(name)
        q(spark, sfDir).count() // warm-up: codegen, JIT, file listing
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          q(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        spark.catalog.clearCache()
        times(1)
      }

    val rows = Queries.map { name =>
      val ts = Sfs.map(sf => cell(name, s"$root/$sf"))
      val ratio = if (ts(1) > 0) ts(2) / ts(1) else Double.NaN
      println(f"| $name%-26s | ${ts(0)}%6.2f | ${ts(1)}%6.2f | ${ts(2)}%6.2f | ${ratio}%5.1fx |")
      name -> ts
    }
    val json = rows.map { case (n, ts) =>
      "\"" + n + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    println(s"""{"sfs":["${Sfs.mkString("\",\"")}"],"sweep":$json}""")
    spark.stop()
  }
}
