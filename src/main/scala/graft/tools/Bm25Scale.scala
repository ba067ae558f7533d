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

      // Part 4 (r17 — VERDICT r16 #5): the standing-service decade
      // point. 512 two-term bags answered as ONE batch, measured on
      // BOTH read branches: the default literal-isin pruning (the
      // batch vocabulary here is <= the full 30-word GenSf vocab, well
      // under maxLiteralTerms) and the forced SEMI-JOIN branch
      // (maxLiteralTerms = 1 — the mega-vocabulary plan shape, where
      // inlined literals would make the plan the bottleneck).
      {
        import spark.implicits._
        val v = GenSf.Vocab
        val bags512 = (0 until 512).map(i =>
          (i.toLong, Seq(v(i * 7 % v.size), v((i * 13 + 5) % v.size))))
          .toDF("query_id", "terms")
        show("batch512(literal)", median3 {
          graft.operators.Caches.scoped {
            graft.operators.TextOps.bm25BatchAgainstIndex(bags512, idx,
              kTop = 10).count(): Unit
          }
          spark.catalog.clearCache()
        })
        show("batch512(semijoin)", median3 {
          graft.operators.Caches.scoped {
            graft.operators.TextOps.bm25BatchAgainstIndex(bags512, idx,
              kTop = 10, maxLiteralTerms = 1).count(): Unit
          }
          spark.catalog.clearCache()
        })
      }
    }

    // Part 2: the REALISTIC-vocabulary counterpoint. GenSf's 30-word
    // vocabulary makes df ~ N (every term a stopword) — the index's
    // worst case. Real corpora have 10^5-10^6 vocabularies where a
    // query bag's lists are tiny fractions; generate one (100 K-word
    // Zipf-ish vocabulary, 500 K docs x 60 tokens) and query MID-TAIL
    // terms so selectivity is what retrieval actually sees.
    {
      val dir = "/tmp/graft_bm25scale/bigvocab"
      val p = s"$dir/documents.parquet"
      if (!new java.io.File(p).exists()) {
        val id = col("id")
        def u(seed: String, x: org.apache.spark.sql.Column) =
          shiftrightunsigned(xxhash64(lit(seed), x), 11).cast("double") /
            lit(9007199254740992.0)
        // u^3 biases toward 0: rank-0 words dominate, tail is long
        val words = transform(sequence(lit(0), lit(59)), i =>
          concat(lit("w"), floor(pow(u("zipf", id * 64 + i), 3.0)
            * 100000).cast("long").cast("string")))
        spark.range(500000).select(id.as("doc_id"),
            array_join(words, " ").as("text"), lit("en").as("lang"),
            lit("s0").as("source"))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .coalesce(10).write.mode("overwrite").parquet(p)
      }
      val docs = spark.read.parquet(p)
      val bigTerms = Seq("w31412", "w45077", "w60233") // mid-tail picks
      def median3(body: => Unit): BenchMetrics.Rep = {
        BenchMetrics.timed(spark.sparkContext)(body)
        val reps = (1 to 3).map(_ =>
          BenchMetrics.timed(spark.sparkContext)(body)).sortBy(_.sec)
        reps(1)
      }
      def show(name: String, r: BenchMetrics.Rep): Unit =
        println(f"bigvocab $name%-18s sec=${r.sec}%7.2f " +
          f"shuffle_mb=${r.shuffleBytes / 1048576.0}%8.2f " +
          f"jobs=${r.jobs}%4d task_sec=${r.taskMs / 1e3}%7.2f")
      show("bm25TopK(full)", median3 {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.bm25TopK(docs, bigTerms).count(): Unit
        }
        spark.catalog.clearCache()
      })
      val idx = s"$dir/idx"
      show("buildBm25Index", BenchMetrics.timed(spark.sparkContext) {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.buildBm25Index(docs, idx)
        }
        spark.catalog.clearCache()
      })
      show("bm25AgainstIndex", median3 {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.bm25AgainstIndex(spark, idx, bigTerms)
            .count(): Unit
        }
        spark.catalog.clearCache()
      })
      // df sanity so the point is documented with its selectivity
      val dfRows = spark.read.parquet(s"$idx/postings")
        .filter(col("term").isin(bigTerms: _*))
        .groupBy(col("term")).count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted
      println(s"bigvocab df: ${dfRows.mkString(", ")} of 500000 docs")

      // Part 3: batch amortization — the bm25BatchAgainstIndex claim
      // measured. 50 distinct 2-term bags answered as ONE batch (one
      // pruned read) vs 50 sequential per-bag recomputes (each
      // re-tokenizing the corpus) vs 50 sequential index queries
      // (each its own pruned read — the no-batch-API strawman).
      import spark.implicits._
      val bags = (0 until 50).map(i =>
        (i.toLong, Seq(s"w${30000 + i * 37}", s"w${50000 + i * 53}")))
        .toDF("query_id", "terms")
      val bagList = (0 until 50).map(i =>
        Seq(s"w${30000 + i * 37}", s"w${50000 + i * 53}"))
      show("batch(50 bags)", median3 {
        graft.operators.Caches.scoped {
          graft.operators.TextOps.bm25BatchAgainstIndex(bags, idx,
            kTop = 10).count(): Unit
        }
        spark.catalog.clearCache()
      })
      show("50x index query", BenchMetrics.timed(spark.sparkContext) {
        bagList.foreach { ts =>
          graft.operators.Caches.scoped {
            graft.operators.TextOps.bm25AgainstIndex(spark, idx, ts,
              kTop = 10).count(): Unit
          }
        }
        spark.catalog.clearCache()
      })
      show("50x recompute", BenchMetrics.timed(spark.sparkContext) {
        bagList.foreach { ts =>
          graft.operators.Caches.scoped {
            graft.operators.TextOps.bm25TopK(docs, ts, kTop = 10)
              .count(): Unit
          }
        }
        spark.catalog.clearCache()
      })
    }
    spark.stop()
  }
}
