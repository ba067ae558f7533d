package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver: measures representative registry queries at every
  * scale factor of a testdata root (driver tree sf0.001/0.01/0.1, or a
  * [[GenSf]] tree adding sf1.0 — 1000x of input growth end-to-end) so
  * SCALE.md's 100 TB story has MEASURED growth curves, not just
  * plan-shape audits (VERDICT r8 #4, r11 #1).
  *
  * Methodology matches Bench: per (sf, query) one untimed warm-up rep,
  * then median of 3 timed reps; operator-internal caches scoped per
  * query so nothing leaks across cells. Queries chosen to cover the
  * operator families that read the sf tables (relational agg/join,
  * exact + LSH dedup, n-gram contamination, LM scoring, retrieval,
  * ANN, events) — the Fixtures-synthetic OME queries scale by image
  * count, measured separately in [[ScalePoints]].
  *
  * Env knobs: `SPARK_GRAFT_TESTDATA` root (default /root/testdata),
  * `SPARK_GRAFT_SFS` comma list of sf dir names (default the driver
  * tree's three), `SPARK_GRAFT_SWEEP_ONLY` comma list of query names.
  * The JSON line reports per-query medians per sf plus the max driver
  * heap observed per sf — flat heap across 1000x input is the
  * no-driver-accumulation proof.
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
    "entity_triangles", "pit_features", "q_running_revenue",
    // r12 additions: span removal + span-level decontamination
    "exact_substr_dedup", "decontam_spans",
    // r13: the scale-safe two-stage composition, swept next to exact
    // `contamination` (r12 verdict #1) — plus the FIXED-EVAL pair
    // below, the 100 TB-realistic scenario
    "decontam_two_stage",
    "contamination_fixed_eval", "decontam_two_stage_fixed_eval")

  /** Sweep-only variants (not registry queries — no oracle is needed
    * for a timing curve; correctness of both operators is pinned by
    * their registry rows). The registry `contamination` /
    * `decontam_two_stage` rows scale BOTH sides with sf, which bounds
    * any correct algorithm to the O(sf²) PAIR OUTPUT on the
    * saturated-vocab corpus. Real decontamination is not like that:
    * the benchmark set is FIXED while the corpus scales to 100 TB.
    * These rows pin eval to the sf0.01 eval slice (~constant docs)
    * while train scales with the swept sf — the scenario where the
    * Bloom stage's zero-corpus-shuffle pruning is the designed win. */
  private def fixedEval(root: String)(s: SparkSession, sfDir: String,
      twoStage: Boolean): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val train = s.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 25 =!= 0)
    val eval = s.read.parquet(s"$root/sf0.01/documents.parquet")
      .filter(col("doc_id") % 25 === 0)
    if (twoStage) graft.operators.TextOps.decontaminateTwoStage(train, eval)
    else graft.operators.TextOps.contamination(train, eval)
  }

  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("SPARK_GRAFT_TESTDATA", "/root/testdata")
    val sfs = sys.env.getOrElse("SPARK_GRAFT_SFS", "sf0.001,sf0.01,sf0.1")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val queries = sys.env.get("SPARK_GRAFT_SWEEP_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Queries)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val heapMb = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val extras: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "contamination_fixed_eval" ->
        ((s, d) => fixedEval(root)(s, d, twoStage = false)),
      "decontam_two_stage_fixed_eval" ->
        ((s, d) => fixedEval(root)(s, d, twoStage = true)))
    def cell(name: String, sf: String): Double =
      graft.operators.Caches.scoped {
        val q = extras.getOrElse(name, graft.SparkEntry.queries(name))
        val sfDir = s"$root/$sf"
        q(spark, sfDir).count() // warm-up: codegen, JIT, file listing
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          q(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        spark.catalog.clearCache()
        val rt = Runtime.getRuntime
        heapMb(sf) = math.max(heapMb(sf),
          (rt.totalMemory - rt.freeMemory) / (1024 * 1024))
        times(1)
      }

    val hdr = sfs.map(s => f"$s%8s").mkString(" | ")
    println(f"| ${"query"}%-26s | $hdr | growth |")
    val rows = queries.map { name =>
      val ts = sfs.map(sf => cell(name, sf))
      // growth = last-sf time over previous-sf time (the 10x step)
      val ratio = if (ts.size >= 2 && ts(ts.size - 2) > 0)
        ts.last / ts(ts.size - 2) else Double.NaN
      val cellsTxt = ts.map(t => f"$t%8.2f").mkString(" | ")
      println(f"| $name%-26s | $cellsTxt | ${ratio}%5.1fx |")
      name -> ts
    }
    val json = rows.map { case (n, ts) =>
      "\"" + n + "\":[" + ts.map(t => f"$t%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val heapJson = sfs.map(s => "\"" + s + "\":" + heapMb(s))
      .mkString("{", ",", "}")
    println(s"""{"root":"$root","sfs":["${sfs.mkString("\",\"")}"],"sweep":$json,"max_heap_mb":$heapJson}""")
    spark.stop()
  }
}
