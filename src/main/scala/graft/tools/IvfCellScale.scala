package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Measures the [[graft.operators.VectorOps.ivfIndexTopK]] probe path
 * at PRODUCTION cell counts (VERDICT r14 #1 "done" criterion: a
 * measured point at nCentroids >= 4096): a 20 K x 64-dim deterministic
 * corpus is indexed at 16 / 256 / 4096 cells and the same 16-probe
 * k=5 query is timed against each. With the r14 literal-codebook plan
 * the 4096-cell point was the degenerate case — ~4096 struct+fold
 * expressions analyzed per query; with the broadcast-centroids join
 * the probe plan is constant-size, so the expected (and measured —
 * SCALE.md "IVF cell-count") shape is probe time FLAT-to-falling in
 * nCentroids while build time grows with the Lloyd assignment cost.
 *
 * Corpus is generated inline (xxhash64-seeded gaussians, unit-norm,
 * the GenSf embeddings construction) — deterministic, no testdata
 * dependency, any size.
 */
object IvfCellScale {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val cells = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(16, 256, 4096)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.ensureRegistered(spark)

    def u(seed: String, id: org.apache.spark.sql.Column) =
      shiftrightunsigned(xxhash64(lit(seed), id), 11).cast("double") /
        lit(9007199254740992.0)
    val raw = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (sqrt(lit(-2.0) * log(u("bm1", col("id") * 64 + d) + lit(1e-12))) *
          cos(lit(2.0 * math.Pi) * u("bm2", col("id") * 64 + d)))
          .cast("float")).as("g"))
    val emb = raw.select(col("vec_id"),
      transform(col("g"), x => (x / sqrt(aggregate(col("g"), lit(0.0d),
        (a, v) => a + v.cast("double") * v.cast("double"))))
        .cast("float")).as("embedding"))
      .transform(graft.operators.Caches.persist(_))
    emb.count() // materialize once; every build sees the same frame

    val results = cells.map { nc =>
      val path = s"/tmp/graft_ivfcellscale/c$nc"
      val b0 = System.nanoTime()
      graft.operators.VectorOps.buildIvfIndex(emb, path, nCentroids = nc,
        iters = 1)
      val buildSec = (System.nanoTime() - b0) / 1e9
      val probes = emb.filter(col("vec_id") < 16)
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.operators.VectorOps.ivfIndexTopK(probes, path, k = 5,
          nProbe = 1).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      once() // warm-up
      val times = (1 to 3).map(_ => once()).sorted
      println(f"nCentroids=$nc%5d build=$buildSec%.2fs probe_median=" +
        f"${times(1)}%.3fs (${times.map(t => f"$t%.3f").mkString(", ")})")
      (nc, buildSec, times(1))
    }
    val json = results.map { case (nc, b, p) =>
      f"""{"cells":$nc,"build_sec":$b%.3f,"probe_sec":$p%.4f}"""
    }.mkString("[", ",", "]")
    println(s"""{"n":$n,"dims":64,"probes":16,"k":5,"points":$json}""")
    spark.stop()
  }
}
