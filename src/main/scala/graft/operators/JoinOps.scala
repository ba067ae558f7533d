package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Join-optimization operators — the techniques that make selective
 * joins survive 100 TB when neither side broadcasts.
 */
object JoinOps {

  /**
   * Bloom runtime-filter semi-join: keep the `large` rows whose key
   * appears in `small`, WITHOUT shuffling the full large side when the
   * join is selective and `small`'s key set is too big to broadcast as
   * a hash relation but fits a Bloom BITMAP (the manual form of
   * Spark 3.3's row-level runtime filters / Databricks' Bloom join
   * indexes; also exactly [[TextOps.bloomDecontaminate]]'s shape
   * applied to relational keys).
   *
   * Two stages, both exact end-to-end:
   *  1. the small side's distinct keys aggregate to a `2^(4·hexDigits)`
   *     -bit bitmap (≤ bitmap/64 longs collected — key-space bounded,
   *     independent of row counts) that rides to the large side's scan
   *     as a LITERAL and kills non-matching rows MAP-SIDE (no false
   *     negatives, so nothing correct is lost);
   *  2. survivors — the selective fraction plus Bloom false positives —
   *     pay the exact LEFT SEMI join, which removes the false
   *     positives.
   *
   * Result = exactly `large ⋉ small`; the bitmap only moves WHERE the
   * filtering happens (before the exchange instead of after). Portable
   * hashing (md5-hex positions), so an external engine replays the
   * semantics with a plain semi-join.
   */
  def bloomSemiJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      numHashes: Int = 3, hexDigits: Int = 5): DataFrame = {
    require(hexDigits >= 1 && hexDigits <= 15,
      s"bloomSemiJoin: hexDigits $hexDigits not in [1,15]")
    require(numHashes >= 1, "bloomSemiJoin: numHashes must be >= 1")
    val m = 1L << (4 * hexDigits)
    val nWords = ((m + 63) / 64).toInt
    def positions(k: Column): Seq[Column] = (0 until numHashes).map(i =>
      conv(substring(md5(concat(lit(i.toString), lit("|"),
        k.cast("string"))), 1, hexDigits), 16, 10).cast("long"))
    def wordOf(p: Column): Column = shiftright(p, 6).cast("int")
    def maskOf(p: Column): Column =
      call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))
    val keys = Caches.persist(
      small.select(col(smallKey).as("k")).distinct())
    val bits = new Array[Long](nWords)
    keys.select(explode(array(positions(col("k")): _*)).as("p"))
      .select(wordOf(col("p")).as("w"), maskOf(col("p")).as("m"))
      .groupBy(col("w")).agg(call_function("bit_or", col("m")).as("mask"))
      .collect()
      .foreach(r => bits(r.getInt(0)) = r.getLong(1))
    val bitsLit = typedLit(bits.toSeq)
    val mightContain = positions(col(largeKey)).map(p =>
      element_at(bitsLit, wordOf(p) + 1)
        .bitwiseAND(maskOf(p)) =!= 0L).reduce(_ && _)
    large
      .filter(mightContain)
      .join(keys.withColumnRenamed("k", largeKey), Seq(largeKey),
        "left_semi")
  }
}
