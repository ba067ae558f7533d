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
    // one persisted distinct-keys frame feeds BOTH stages (build scans
    // it eagerly, the exact semi-join consumes it in-plan) through the
    // pre-distinct internal paths, so the small side distincts ONCE —
    // the public bloomBitmap/bloomSemiJoinWith entry points re-distinct
    // for safety on arbitrary inputs, which here would re-aggregate the
    // cached frame twice per call for nothing (r12 advice)
    val keys = Caches.persist(
      small.select(col(smallKey).as("k")).distinct())
    bloomProbeDistinct(large, largeKey, keys, "k",
      bitmapOfDistinct(keys, "k", numHashes, hexDigits),
      numHashes, hexDigits)
  }

  /** Bloom hash positions for key `k`: `numHashes` md5-prefix values in
    * `[0, 16^hexDigits)` — portable (an external engine reproduces them
    * from md5 alone). Shared by the bitmap BUILD and the PROBE so the
    * two stages can never drift. */
  private def bloomPositions(k: Column, numHashes: Int,
      hexDigits: Int): Seq[Column] = (0 until numHashes).map(i =>
    conv(substring(md5(concat(lit(i.toString), lit("|"),
      k.cast("string"))), 1, hexDigits), 16, 10).cast("long"))

  private def bloomWord(p: Column): Column = shiftright(p, 6).cast("int")
  private def bloomMask(p: Column): Column =
    call_function("shiftleft", lit(1L), pmod(p, lit(64L)).cast("int"))

  /**
   * Build stage of [[bloomSemiJoin]], exposed separately so a workload
   * that probes the SAME small-side key set many times (a bench's
   * repeated reps, a decontamination filter reused across corpus
   * shards) pays the distinct+aggregate build ONCE and reuses the
   * bitmap as a literal — the fixture-stage split the r11 verdict asked
   * for. Eager: returns the `2^(4·hexDigits)`-bit bitmap as packed
   * longs (≤ bitmap/64 words collected — key-space bounded, never
   * row-count bounded).
   */
  def bloomBitmap(small: DataFrame, smallKey: String,
      numHashes: Int = 3, hexDigits: Int = 5): Array[Long] =
    bitmapOfDistinct(small.select(col(smallKey).as("k")).distinct(), "k",
      numHashes, hexDigits)

  /** [[bloomBitmap]] over an ALREADY-DISTINCT keys frame (no
    * re-aggregation — duplicate keys would not corrupt the bitmap, but
    * re-distincting a cached distinct frame is pure waste). */
  private def bitmapOfDistinct(keys: DataFrame, keyCol: String,
      numHashes: Int, hexDigits: Int): Array[Long] = {
    require(hexDigits >= 1 && hexDigits <= 15,
      s"bloomSemiJoin: hexDigits $hexDigits not in [1,15]")
    require(numHashes >= 1, "bloomSemiJoin: numHashes must be >= 1")
    val m = 1L << (4 * hexDigits)
    val nWords = ((m + 63) / 64).toInt
    val bits = new Array[Long](nWords)
    keys
      .select(explode(array(
        bloomPositions(col(keyCol), numHashes, hexDigits): _*)).as("p"))
      .select(bloomWord(col("p")).as("w"), bloomMask(col("p")).as("m"))
      .groupBy(col("w")).agg(call_function("bit_or", col("m")).as("mask"))
      .collect()
      .foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** Probe stage of [[bloomSemiJoin]] against a pre-built bitmap: the
    * map-side Bloom filter kills non-matching `large` rows before the
    * exchange, then the exact left-semi join against `small`'s distinct
    * keys removes the false positives. `numHashes`/`hexDigits` must
    * match the build call. */
  def bloomSemiJoinWith(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String, bits: Array[Long],
      numHashes: Int = 3, hexDigits: Int = 5): DataFrame =
    bloomProbeDistinct(large, largeKey,
      small.select(col(smallKey).as("k")).distinct(), "k", bits,
      numHashes, hexDigits)

  /** [[bloomSemiJoinWith]] over an ALREADY-DISTINCT keys frame — the
    * semi-join ignores right-side duplicates, so the distinct is purely
    * a size optimization the internal caller has already paid. */
  private def bloomProbeDistinct(large: DataFrame, largeKey: String,
      keys: DataFrame, keyCol: String, bits: Array[Long],
      numHashes: Int, hexDigits: Int): DataFrame = {
    require(bits.length == (((1L << (4 * hexDigits)) + 63) / 64).toInt,
      s"bloomSemiJoinWith: bitmap has ${bits.length} words, " +
        s"hexDigits $hexDigits needs ${((1L << (4 * hexDigits)) + 63) / 64}")
    val bitsLit = typedLit(bits.toSeq)
    val mightContain =
      bloomPositions(col(largeKey), numHashes, hexDigits).map(p =>
        element_at(bitsLit, bloomWord(p) + 1)
          .bitwiseAND(bloomMask(p)) =!= 0L).reduce(_ && _)
    large
      .filter(mightContain)
      .join(keys.select(col(keyCol).as(largeKey)), Seq(largeKey),
        "left_semi")
  }

  /**
   * Salted equi-join — the classic hot-key mitigation
   * ([[graft.operators.EventOps.skewReport]] DIAGNOSES the skew; this
   * removes it): the large side's rows spread across `salts` virtual
   * partitions by a deterministic hash of the whole row's join
   * context, and the small side replicates `salts`× so every
   * (key, salt) cell still finds its match — the result is EXACTLY
   * the plain inner join, but a key holding 30% of the corpus now
   * lands on `salts` reducers instead of one. Use when AQE's skew
   * split can't help (e.g. the skew is in a hash-aggregation feeding
   * the join) or on engines without it; `salts` ≈ the worst key's
   * multiple of a healthy partition.
   *
   * Scale: large side gains one narrow `pmod(hash(...))` column — no
   * extra shuffle beyond the join's own; the small side's ×`salts`
   * replication is the explicit price, so keep it for genuinely small
   * dimension sides.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, "saltedJoin: salts must be >= 1")
    val l = large.withColumn("__salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltTable = broadcast(small.sparkSession.range(1)
      .select(explode(sequence(lit(0), lit(salts - 1))).as("__s"))
      .select(col("__s").cast("int").as("__salt")))
    l.join(small.crossJoin(saltTable), Seq(key, "__salt")).drop("__salt")
  }

  /**
   * Point-in-time-correct feature join — the FEATURE-STORE
   * materialization primitive: for every label row, the latest feature
   * observation for the same entity with `feature_ts <= label_ts`
   * (optionally within `maxStalenessNs`), so training examples can
   * never leak future information. This is THE correctness property
   * feature stores (Feast's point-in-time join, "time-travel join")
   * exist to provide; chain one call per feature table and assemble on
   * the label id.
   *
   * Output: one row per label —
   * `(label_id, entity, ts, {prefix}_ts, {prefix}_id, {prefix}_val,
   * {prefix}_staleness)`, NULL feature columns when no in-window
   * observation exists.
   *
   * Scale shape: the [[EventOps.asofJoinWith]] union + ordered-window
   * formulation — ONE entity-keyed shuffle of narrow rows, never a
   * range join; the two `last(... ignoreNulls)` running values share a
   * single sort, and because that order is TOTAL (`ts, side, id`) they
   * always surface the same feature row, so ts and value stay
   * consistent. Per-feature-table cost is one narrow shuffle; the
   * final per-label assembly joins on the (already reduced) label ids.
   */
  def pointInTimeJoin(labels: DataFrame, features: DataFrame,
      entityCol: String, tsCol: String, idCol: String,
      valueCol: String, prefix: String,
      maxStalenessNs: Long = -1L): DataFrame = {
    require(prefix.nonEmpty, "pointInTimeJoin: prefix must be non-empty")
    def side(df: DataFrame, s: Int, v: Column) = df.select(
      col(entityCol).cast("long").as("entity"),
      col(tsCol).cast("long").as("ts"),
      col(idCol).cast("long").as("id"), lit(s).as("side"),
      v.cast("double").as("fv"))
    val u = side(labels, 1, lit(null))
      .unionAll(side(features, 0, col(valueCol)))
    val isF = col("side") === 0
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("entity"))
      .orderBy(col("ts").asc, col("side").asc, col("id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val cand = u
      .withColumn("f_ts", last(when(isF, col("ts")), ignoreNulls = true)
        .over(w))
      .withColumn("f_id", last(when(isF, col("id")), ignoreNulls = true)
        .over(w))
      .withColumn("f_val", last(when(isF, col("fv")), ignoreNulls = true)
        .over(w))
      .filter(col("side") === 1)
    val fresh = col("f_ts").isNotNull &&
      (if (maxStalenessNs < 0) lit(true)
       else col("ts") - col("f_ts") <= maxStalenessNs)
    cand.select(col("id").as("label_id"), col("entity"), col("ts"),
      when(fresh, col("f_ts")).as(s"${prefix}_ts"),
      when(fresh, col("f_id")).as(s"${prefix}_id"),
      when(fresh, col("f_val")).as(s"${prefix}_val"),
      when(fresh, col("ts") - col("f_ts")).as(s"${prefix}_staleness"))
  }

  /**
   * Bucketed co-located join — the ZERO-SHUFFLE big-big join: both
   * sides are written as bucketed+sorted tables on the join key with
   * the same bucket count, so Spark's scan emits the partitioning and
   * ordering the sort-merge join needs and the planner elides BOTH
   * exchanges AND both sorts. This is the technique for a fact-fact
   * join neither side of which broadcasts: pay the bucket write once,
   * then every subsequent join on that key is exchange-free — at
   * 100 TB the bucketed layout amortizes across the whole workload
   * (the Hive-compatible layout every serious warehouse pre-buckets
   * its biggest tables into).
   *
   * `writeBucketed` registers an EXTERNAL table at `path` (explicit
   * location — nothing lands in a default warehouse dir);
   * `joinBucketed` reads both tables back and merge-joins them. The
   * `merge` hint pins SMJ so a small test corpus cannot silently
   * broadcast and bypass the property being demonstrated; PlanSpec
   * asserts the join subtree has no Exchange.
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  /** Join two same-bucketing tables on `leftKey == rightKey`; the plan
    * must contain no Exchange under the SortMergeJoin. */
  def joinBucketed(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
