package graft

import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Zipf fit on an exact power law + hash-split determinism. */
class ZipfSplitSpec extends SparkSpec {

  test("zipfReport: an exact count = C/rank corpus fits slope -1, r2 1") {
    import spark.implicits._
    // counts 6, 3, 2 at ranks 1, 2, 3: ln(count) = ln 6 - ln(rank)
    val words = Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val docs = Seq(words.mkString(" ")).toDF("text")
    val r = TextOps.zipfReport(docs, topN = 3).collect().head
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === -1.0)                    // slope
    assert(r.getDouble(2) === math.round(math.log(6) * 1e6) / 1e6) // intercept
    assert(r.getDouble(3) === 1.0)                     // r2
  }

  test("zipfReport: ties rank deterministically by token") {
    import spark.implicits._
    val docs = Seq("b a b a").toDF("text")
    // both tokens count 2; ranks must be a=1, b=2 in every run
    val out = TextOps.zipfReport(docs, topN = 2).collect().head
    assert(out.getLong(0) === 2L)
    assert(out.getDouble(1) === 0.0) // flat counts -> slope 0
  }

  test("datasetSplit: stable, thresholded, and subset-independent") {
    import spark.implicits._
    val docs = (0L until 1000L).toDF("doc_id")
    val a = TextOps.datasetSplit(docs).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(a.size === 1000)
    a.foreach { case (_, (b, s)) =>
      assert(b >= 0 && b < 256)
      val expect = if (b < 204) "train" else if (b < 230) "val" else "test"
      assert(s === expect)
    }
    // ~80/10/10 split within a loose band
    val frac = a.values.count(_._2 == "train").toDouble / 1000
    assert(frac > 0.72 && frac < 0.88, s"train fraction $frac")
    // a doc's split never depends on which other docs are present
    val solo = TextOps.datasetSplit(Seq(5L).toDF("doc_id"))
      .collect().head
    assert((solo.getInt(1), solo.getString(2)) === a(5L))
  }
}
