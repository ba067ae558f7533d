package graft

import org.apache.spark.sql.DataFrame

import graft.operators.TextOps

/** Persisted BM25 index lifecycle: build == per-batch scorer bit-for-bit,
  * append == rebuild, at-least-once replay convergence, stats repair. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  // varied tf/dl, one doc with no query terms, one token-free doc
  // (contributes to N and avgdl but can never score — the stats tables
  // must see it even though it emits zero postings)
  private lazy val corpus = Seq(
    (0L, "hash join beats sort merge join when one side broadcasts", "en", "s0", 57L),
    (1L, "vector search over a hash partitioned index", "en", "s0", 44L),
    (2L, "join join join repeated join terms stress tf", "en", "s1", 45L),
    (3L, "completely unrelated prose about microscopes", "en", "s1", 45L),
    (4L, "hash vector hash vector alternating terms", "en", "s0", 42L),
    (5L, "   ", "en", "s1", 3L),
    (6L, "a long tail document mentioning vector once among many many other filler words to stretch dl", "en", "s0", 93L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private val terms = Seq("hash", "join", "vector")

  private def rows(df: DataFrame) = df.collect()
    .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("doc_id"),
      r.getAs[Double]("score"))).toSeq.sortBy(_._1)

  test("bm25AgainstIndex equals bm25TopK bit-for-bit (scores, ranks)") {
    val path = java.nio.file.Files.createTempDirectory("bm25idx").toString
    TextOps.buildBm25Index(corpus, path)
    val direct = rows(TextOps.bm25TopK(corpus, terms, kTop = 20))
    val viaIdx = rows(TextOps.bm25AgainstIndex(spark, path, terms,
      kTop = 20))
    assert(direct.nonEmpty && viaIdx === direct)
    // the token-free doc reached the stats: N = 7, sum_dl = sum of dls
    val st = spark.read.parquet(s"$path/stats").head()
    assert(st.getAs[Long]("n_docs") === 7L)
    assert(st.getAs[Long]("sum_dl") ===
      corpus.select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          TextOps.tokens($"text")))).head().getLong(0))
    spark.catalog.clearCache()
  }

  test("appendToBm25Index: build-half + append-half answers identically " +
      "to a full build (postings, stats, query result)") {
    val full = java.nio.file.Files.createTempDirectory("bm25_full").toString
    val incr = java.nio.file.Files.createTempDirectory("bm25_incr").toString
    TextOps.buildBm25Index(corpus, full)
    TextOps.buildBm25Index(corpus.filter($"doc_id" % 2 === 0), incr)
    TextOps.appendToBm25Index(corpus.filter($"doc_id" % 2 =!= 0), incr)
    def postings(p: String) = spark.read.parquet(s"$p/postings")
      .select("term", "doc_id", "tf", "dl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(postings(incr) === postings(full))
    def stats(p: String) = {
      val r = spark.read.parquet(s"$p/stats").head()
      (r.getAs[Long]("n_docs"), r.getAs[Long]("sum_dl"))
    }
    assert(stats(incr) === stats(full))
    assert(rows(TextOps.bm25AgainstIndex(spark, incr, terms)) ===
      rows(TextOps.bm25AgainstIndex(spark, full, terms)))
    spark.catalog.clearCache()
  }

  test("a REPLAYED append (the at-least-once crash/retry story) " +
      "converges: duplicate rows absorbed, stats exact, answers equal") {
    val once = java.nio.file.Files.createTempDirectory("bm25_once").toString
    val twice = java.nio.file.Files.createTempDirectory("bm25_twice").toString
    val inc = corpus.filter($"doc_id" >= 4L)
    for (p <- Seq(once, twice)) {
      TextOps.buildBm25Index(corpus.filter($"doc_id" < 4L), p)
      TextOps.appendToBm25Index(inc, p)
    }
    TextOps.appendToBm25Index(inc, twice) // full replay of a COMPLETED append
    val st = spark.read.parquet(s"$twice/stats").head()
    assert(st.getAs[Long]("n_docs") === 7L,
      "replayed doclens rows must not inflate n_docs")
    assert(rows(TextOps.bm25AgainstIndex(spark, twice, terms)) ===
      rows(TextOps.bm25AgainstIndex(spark, once, terms)))
    spark.catalog.clearCache()
  }

  test("crash windows fail loud and repair: missing stats names " +
      "refreshBm25Stats; missing params names the rebuild") {
    val path = java.nio.file.Files.createTempDirectory("bm25_crash").toString
    TextOps.buildBm25Index(corpus, path)
    val before = rows(TextOps.bm25AgainstIndex(spark, path, terms))
    // simulate a crash during the stats overwrite: the table vanishes
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/stats"))
    val e1 = intercept[IllegalArgumentException] {
      TextOps.bm25AgainstIndex(spark, path, terms).collect()
    }
    assert(e1.getMessage.contains("refreshBm25Stats"))
    TextOps.refreshBm25Stats(spark, path)
    assert(rows(TextOps.bm25AgainstIndex(spark, path, terms)) === before)
    // an index without its constant manifest is unverifiable — refused
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$path/params"))
    val e2 = intercept[IllegalArgumentException] {
      TextOps.bm25AgainstIndex(spark, path, terms).collect()
    }
    assert(e2.getMessage.contains("buildBm25Index"))
    spark.catalog.clearCache()
  }
}
