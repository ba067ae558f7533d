package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Seeded randomized properties of the r12 span operators against a
  * direct Scala reference implementation: over random small-vocab
  * corpora, exactSubstrDedup's rewrite must equal "drop every token
  * inside any corpus-repeated k-gram window", decontaminateSpans must
  * equal the same rule with the flag set drawn from the eval corpus,
  * and the removed counts must equal repeatedSpans' coverage (the
  * exact_substr_cert invariant, here over arbitrary corpora). */
class SpanPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Reference rule: positions covered by any k-window whose gram is
    * in `flagged`; returns (keptText, nRemoved). */
  private def refExcise(toks: Seq[String], k: Int,
      flagged: Set[String]): (String, Long) = {
    val covered = Array.fill(toks.length)(false)
    for (p <- 0 to toks.length - k) {
      if (flagged.contains(toks.slice(p, p + k).mkString(" ")))
        (p until p + k).foreach(covered(_) = true)
    }
    val kept = toks.zipWithIndex.collect { case (t, i) if !covered(i) => t }
    (kept.mkString(" "), covered.count(identity).toLong)
  }

  private def grams(toks: Seq[String], k: Int): Seq[String] =
    if (toks.length < k) Nil
    else (0 to toks.length - k).map(p => toks.slice(p, p + k).mkString(" "))

  test("exactSubstrDedup == reference excision over random corpora; " +
      "n_removed == repeatedSpans coverage") {
    val vocab = Vector("a", "b", "c", "d", "e")
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4) {
      val k = 2 + rnd.nextInt(3) // 2..4
      val corpus = (0L until 40L).map { id =>
        val n = rnd.nextInt(15) // 0..14 tokens — includes sub-k docs
        (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      val docs = corpus.toDF("doc_id", "text")
      // reference flag set: grams with corpus frequency >= 2
      val allGrams = corpus.flatMap { case (_, text) =>
        grams(text.split(" ").filter(_.nonEmpty).toSeq, k) }
      val flagged = allGrams.groupBy(identity)
        .collect { case (g, occ) if occ.size >= 2 => g }.toSet
      val got = TextOps.exactSubstrDedup(docs, k = k)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("text_dedup"), r.getAs[Long]("n_removed")))
        .toMap
      val spans = TextOps.repeatedSpans(docs, k = k)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("covered_tokens")).toMap
      corpus.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).toSeq
        val want = refExcise(toks, k, flagged)
        assert(got(id) === want,
          s"trial $trial k=$k doc $id ('$text'): got ${got(id)}, " +
            s"want $want")
        assert(spans(id) === want._2,
          s"trial $trial doc $id: repeatedSpans coverage ${spans(id)} " +
            s"!= removed ${want._2}")
      }
      spark.catalog.clearCache()
    }
  }

  test("decontaminateSpans == reference excision with eval-drawn flags; " +
      "empty eval removes nothing") {
    val vocab = Vector("a", "b", "c", "d")
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val k = 2 + rnd.nextInt(2) // 2..3
      def mk(n: Int, ids: Range): Seq[(Long, String)] = ids.map { id =>
        (id.toLong, (0 until rnd.nextInt(n)).map(_ =>
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val train = mk(14, 0 until 25)
      val eval = mk(10, 100 until 110)
      // reference flag set: every eval k-gram (plus the short-doc
      // whole-text gram, which can never equal a k-gram string for
      // k >= 2 over single-char tokens — lengths differ)
      val flagged = eval.flatMap { case (_, t) =>
        grams(t.split(" ").filter(_.nonEmpty).toSeq, k) }.toSet
      val got = TextOps.decontaminateSpans(train.toDF("doc_id", "text"),
          eval.toDF("doc_id", "text"), k = k)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          (r.getAs[String]("text_dedup"), r.getAs[Long]("n_removed")))
        .toMap
      train.foreach { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty).toSeq
        assert(got(id) === refExcise(toks, k, flagged),
          s"trial $trial k=$k doc $id ('$text')")
      }
      // empty eval: nothing flags, every doc passes through verbatim
      val none = TextOps.decontaminateSpans(train.toDF("doc_id", "text"),
          Seq.empty[(Long, String)].toDF("doc_id", "text"), k = k)
        .collect()
      assert(none.forall(_.getAs[Long]("n_removed") == 0L))
      spark.catalog.clearCache()
    }
  }
}
