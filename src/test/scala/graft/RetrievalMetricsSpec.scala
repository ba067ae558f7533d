package graft

import graft.operators.VectorOps

/** IR metrics on a hand-ranked toy corpus. */
class RetrievalMetricsSpec extends SparkSpec {

  test("retrievalMetrics: MRR, precision@k, nDCG on a known ranking") {
    import spark.implicits._
    // probe 0 = (1,0), label 1. Ranking by cosine:
    //   rank 1: vec 1 (1, 0.01)  label 1  rel
    //   rank 2: vec 2 (0.9, 0.5) label 0
    //   rank 3: vec 3 (0, 1)     label 1  rel
    val emb = Seq(
      (0L, Seq(1f, 0f), 1),
      (1L, Seq(1f, 0.01f), 1),
      (2L, Seq(0.9f, 0.5f), 0),
      (3L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = VectorOps.retrievalMetrics(emb, nProbes = 1, k = 3)
      .collect().head
    assert(r.getLong(0) === 0L)
    assert(r.getLong(1) === 2L) // corpus holds two label-1 neighbors
    assert(r.getLong(2) === 2L) // both retrieved in the top 3
    assert(r.getDouble(3) === 1.0)      // first relevant at rank 1
    assert(r.getDouble(4) === 0.666667) // 2/3
    // dcg = 1 + 1/log2(4) = 1.5; idcg(2) = 1 + 1/log2(3)
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2))
    assert(r.getDouble(5) === math.round(1.5 / idcg * 1e6) / 1e6)
  }

  test("retrievalMetrics: a probe with no relevant corpus item " +
      "reports zero MRR and NULL nDCG") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(1f, 0f), 7),
      (1L, Seq(1f, 0.01f), 1),
      (2L, Seq(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
    val r = VectorOps.retrievalMetrics(emb, nProbes = 1, k = 2)
      .collect().head
    assert(r.getLong(1) === 0L && r.getLong(2) === 0L)
    assert(r.getDouble(3) === 0.0)
    assert(r.isNullAt(5))
  }
}
