package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

/** Column-level entry points for the native pixel expressions, exposed
  * through the session function registry (the Column(expr) constructor
  * is private[sql] in Spark 4). Registration is idempotent. */
package object functions {

  /** Name -> Catalyst builder for every native expression — the single
    * table behind both `ensureRegistered` (programmatic) and
    * [[graft.GraftExtensions]] (`spark.sql.extensions` conf). */
  private[graft] val nativeBuilders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "graft_pixel_crop" -> (exprs =>
      PixelCrop(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4), exprs(5))),
    "graft_block_mean_2x" -> (exprs =>
      BlockMean2x(exprs(0), exprs(1), exprs(2))),
    "graft_minhash_sig" -> (exprs => {
      require(exprs.length == 2 && exprs(1).foldable &&
        exprs(1).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_minhash_sig(shingles, numHashes): numHashes must be an INT literal")
      MinHashSignature(exprs(0), exprs(1).eval(null).asInstanceOf[Int])
    }),
    "graft_simhash64" -> (exprs => SimHash64(exprs(0))),
    "graft_cosine" -> (exprs => CosineSim(exprs(0), exprs(1))),
    "graft_l2sq" -> (exprs => L2Sq(exprs(0), exprs(1))),
    "graft_count_token" -> (exprs => CountToken(exprs(0), exprs(1))),
    "graft_project" -> (exprs => {
      require(exprs.length == 2 && exprs(1).foldable &&
        exprs(1).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_project(embedding, outDims): outDims must be an INT literal")
      ProjectEmbedding(exprs(0), exprs(1).eval(null).asInstanceOf[Int])
    }),
    "graft_pq_encode" -> (exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable &&
        exprs(2).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_pq_encode(embedding, book, m): book must be an " +
          "ARRAY<FLOAT> literal and m an INT literal")
      PqEncode(exprs(0), literalFloats(exprs(1), "graft_pq_encode"),
        exprs(2).eval(null).asInstanceOf[Int])
    }),
    "graft_pq_adc" -> (exprs => {
      require(exprs.length == 3 && exprs(2).foldable,
        "graft_pq_adc(probe, codes, book): book must be an " +
          "ARRAY<FLOAT> literal")
      PqAdcDist(exprs(0), exprs(1), literalFloats(exprs(2), "graft_pq_adc"))
    }),
    "graft_bpe_encode" -> (exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        "graft_bpe_encode(token, lefts, rights): merge lists must be " +
          "ARRAY<STRING> literals")
      BpeEncode(exprs(0), literalStrings(exprs(1), "graft_bpe_encode"),
        literalStrings(exprs(2), "graft_bpe_encode"))
    }),
    "graft_plane_fold" -> (exprs => {
      require(exprs.length == 2 && exprs(1).foldable &&
        exprs(1).dataType == org.apache.spark.sql.types.StringType,
        "graft_plane_fold(stack, how): how must be a STRING literal")
      val how = exprs(1).eval(null).toString
      require(how == "max" || how == "mean",
        s"graft_plane_fold: how must be 'max' or 'mean' (got '$how')")
      PlaneStackFold(exprs(0), how)
    }),
    "graft_synth_ramp" -> (exprs => SynthRampPixels(exprs(0), exprs(1))),
    "graft_pixel_sum" -> (exprs => PixelSum(exprs(0))),
    "graft_pixel_count_ge" -> (exprs => PixelCountGe(exprs(0), exprs(1))),
    "graft_pixel_brenner" -> (exprs => PixelBrenner(exprs(0), exprs(1))),
    "graft_pixel_dot" -> (exprs => PixelDot(exprs(0), exprs(1))),
    "graft_pixel_sum_agg" -> (exprs => PixelSumAgg(exprs(0))),
    "graft_micro_l2" -> (exprs => MicroL2(exprs(0), exprs(1))),
    "graft_micro_argmin" -> (exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable,
        "graft_micro_argmin(qx, ids, book): ids and book must be " +
          "ARRAY<BIGINT> literals")
      MicroArgmin(exprs(0), literalLongs(exprs(1), "graft_micro_argmin"),
        literalLongs(exprs(2), "graft_micro_argmin"))
    }),
    "graft_pixel_permute" -> (exprs => {
      require(exprs.length == 4 && exprs(3).foldable &&
        exprs(3).dataType == org.apache.spark.sql.types.StringType,
        "graft_pixel_permute(pixels, sx, sy, mode): mode must be a " +
          "STRING literal")
      PixelPermute(exprs(0), exprs(1), exprs(2),
        exprs(3).eval(null).toString)
    }),
    "graft_cc_objects" -> (exprs => PixelCcObjects(exprs(0), exprs(1))),
    "graft_cc_objects_intensity" -> (exprs =>
      PixelCcObjectsIntensity(exprs(0), exprs(1), exprs(2))),
    "graft_pixel_rank_map" -> (exprs =>
      PixelRankMap(exprs(0), exprs(1))),
    "graft_focus_stack" -> (exprs => FocusStack(exprs(0), exprs(1))),
    "graft_pixel_equalize" -> (exprs => {
      require(exprs.length == 2 && exprs(1).foldable &&
        exprs(1).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_pixel_equalize(pixels, levels): levels must be an INT " +
          "literal")
      PixelEqualize(exprs(0), exprs(1).eval(null).asInstanceOf[Int])
    }),
    "graft_pixel_shift" -> (exprs =>
      PixelShiftExpr(exprs(0), exprs(1), exprs(2), exprs(3))),
    "graft_pixel_stretch" -> (exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable &&
        exprs(1).dataType == org.apache.spark.sql.types.IntegerType &&
        exprs(2).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_pixel_stretch(pixels, pLo, pHi): percentiles must be " +
          "INT literals")
      PixelStretch(exprs(0), exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int])
    }),
    "graft_glcm_moments" -> (exprs => {
      require(exprs.length == 4 && exprs(2).foldable && exprs(3).foldable &&
        exprs(2).dataType == org.apache.spark.sql.types.IntegerType &&
        exprs(3).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_glcm_moments(pixels, sx, bins, maxv): bins and maxv must " +
          "be INT literals")
      PixelGlcmMoments(exprs(0), exprs(1),
        exprs(2).eval(null).asInstanceOf[Int],
        exprs(3).eval(null).asInstanceOf[Int])
    }),
    "graft_cdc_boundaries" -> (exprs => {
      require(exprs.length == 3 && exprs(1).foldable && exprs(2).foldable &&
        exprs(1).dataType == org.apache.spark.sql.types.IntegerType &&
        exprs(2).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_cdc_boundaries(text, window, maskBits): window and " +
          "maskBits must be INT literals")
      CdcBoundaries(exprs(0), exprs(1).eval(null).asInstanceOf[Int],
        exprs(2).eval(null).asInstanceOf[Int])
    }),
    "graft_nfc" -> (exprs => NfcNormalize(exprs(0))),
    "graft_zvalue" -> (exprs => {
      require(exprs.length == 3 && exprs(2).foldable &&
        exprs(2).dataType == org.apache.spark.sql.types.IntegerType,
        "graft_zvalue(x, y, bits): bits must be an INT literal")
      ZValue2(exprs(0), exprs(1), exprs(2).eval(null).asInstanceOf[Int])
    }))

  /** Materialize a foldable ARRAY<STRING> argument (the inlined BPE
    * merge list) at expression-build time. */
  private def literalStrings(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String): Array[String] = {
    require(e.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
      e.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
        .elementType == org.apache.spark.sql.types.StringType,
      s"$fn: merge-list literal must be ARRAY<STRING> " +
        s"(got ${e.dataType.catalogString})")
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[org.apache.spark.unsafe.types.UTF8String](
        org.apache.spark.sql.types.StringType).map(_.toString)
  }

  /** Materialize a foldable ARRAY<BIGINT> argument (the inlined
    * micro-unit codebook) at expression-build time. */
  private def literalLongs(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String): Array[Long] = {
    require(e.dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = false) ||
      e.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType, containsNull = true),
      s"$fn: literal must be ARRAY<BIGINT> (got ${e.dataType.catalogString})")
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray()
  }

  /** Materialize a foldable ARRAY<FLOAT> argument (the inlined PQ
    * codebook) at expression-build time. */
  private def literalFloats(
      e: org.apache.spark.sql.catalyst.expressions.Expression,
      fn: String): Array[Float] = {
    require(e.dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = false) ||
      e.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, containsNull = true),
      s"$fn: codebook literal must be ARRAY<FLOAT> " +
        s"(got ${e.dataType.catalogString})")
    e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toFloatArray()
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    nativeBuilders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Native single-pass cosine similarity over float embeddings. */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Native single-pass squared-L2 distance over float embeddings. */
  def l2_sq(a: Column, b: Column): Column =
    call_function("graft_l2sq", a, b)

  /** Native deterministic random projection to `outDims` dims (one loop
    * per row; bit-identical to the columnar HOF formulation). */
  def project_embedding(v: Column, outDims: Int): Column =
    call_function("graft_project", v, lit(outDims))

  /** Native MinHash signature (one md5 loop per row; byte-identical to
    * the column formulation). */
  def minhash_signature(shingles: Column, numHashes: Int): Column =
    call_function("graft_minhash_sig", shingles, lit(numHashes))

  /** Native 64-bit SimHash over a token array. */
  def simhash64(tokens: Column): Column =
    call_function("graft_simhash64", tokens)

  /** Unicode NFC normalization (codegen'd; allocation-free fast path
    * for already-normalized text). Canonicalize before hashing —
    * composed and decomposed accents are different bytes to sha2/md5.
    * Oracle twin: DuckDB `nfc_normalize`. */
  def nfc_normalize(text: Column): Column =
    call_function("graft_nfc", text)

  /** Morton/Z-order interleave of two non-negative longs' low `bits`
    * bits — the multi-dimensional clustering key (x on even bits, y
    * on odd). NULL on null/negative inputs. */
  def z_value(x: Column, y: Column, bits: Int): Column =
    call_function("graft_zvalue", x, y, lit(bits))

  /** Native exact-match occurrence count of `token` in a string array
    * (the BM25 tf kernel; value-identical to
    * `size(filter(arr, _ === token))`). */
  def count_token(tokens: Column, token: Column): Column =
    call_function("graft_count_token", tokens, token)

  /** Native product-quantization encode: `m` nearest-centroid subvector
    * ids (L2, ties to lowest id) against the flattened codebook
    * `book(j*k*sub + c*sub + i)`. */
  def pq_encode(v: Column, book: Array[Float], m: Int): Column =
    call_function("graft_pq_encode", v, lit(book), lit(m))

  /** Native PQ asymmetric distance: approximate squared-L2 between an
    * uncompressed probe and a PQ code array under `book`. */
  def pq_adc(probe: Column, codes: Column, book: Array[Float]): Column =
    call_function("graft_pq_adc", probe, codes, lit(book))

  /** Codegen'd crop of a flat row-major plane (rows [y0,y1), cols
    * [x0,x1) of a `sx`-wide image). Call `ensureRegistered` first (the
    * OmeOps plane operators do). */
  def pixel_crop(pixels: Column, sx: Column,
      x0: Int, x1: Int, y0: Int, y1: Int): Column =
    call_function("graft_pixel_crop", pixels, sx,
      lit(x0), lit(x1), lit(y0), lit(y1))

  /** Codegen'd 2x2 floor block mean (pyramid level) of a flat plane. */
  def block_mean_2x(pixels: Column, sx: Column, sy: Column): Column =
    call_function("graft_block_mean_2x", pixels, sx, sy)

  /** Codegen'd exact index-permutation augmentation of a flat plane
    * (`mode` in hflip | vflip | rot90 | rot180 | transpose). */
  def pixel_permute(pixels: Column, sx: Column, sy: Column,
      mode: String): Column =
    call_function("graft_pixel_permute", pixels, sx, sy, lit(mode))

  /** Native 4-connected-component object extraction over a binary mask
    * (non-zero = foreground): one struct per object, labeled by the
    * component's minimum linear pixel index. */
  def cc_objects(mask: Column, sx: Column): Column =
    call_function("graft_cc_objects", mask, sx)

  /** Native horizontal gray-level co-occurrence moments per plane
    * (`bins` equal-width bins over `[0, maxv)`). */
  def glcm_moments(pixels: Column, sx: Column, bins: Int,
      maxv: Int): Column =
    call_function("graft_glcm_moments", pixels, sx, lit(bins), lit(maxv))

  /** [[cc_objects]] plus per-object integrated/min/max intensity over
    * `pixels` (same geometry as `mask`). */
  def cc_objects_intensity(mask: Column, pixels: Column,
      sx: Column): Column =
    call_function("graft_cc_objects_intensity", mask, pixels, sx)

  /** Native percentile contrast stretch to 8-bit: integer-exact
    * HALF_UP rescale of the `[pLo, pHi]` percentile window; returns
    * `struct(lo, hi, pixels)`. */
  def pixel_stretch(pixels: Column, pLo: Int, pHi: Int): Column =
    call_function("graft_pixel_stretch", pixels, lit(pLo), lit(pHi))

  /** Native integer plane translation with zero fill
    * (`out(y,x) = in(y−dy, x−dx)`); dy/dx are data columns. */
  def pixel_shift(pixels: Column, sx: Column, dy: Column,
      dx: Column): Column =
    call_function("graft_pixel_shift", pixels, sx, dy, dx)

  /** Native integer-exact histogram equalization to `levels` gray
    * levels (CDF map, HALF_UP). */
  def pixel_equalize(pixels: Column, levels: Int): Column =
    call_function("graft_pixel_equalize", pixels, lit(levels))

  /** Native rank-to-target remap: pixel at sorted rank r becomes
    * `targets[r]` (quantile-normalization apply step). */
  def pixel_rank_map(pixels: Column, targets: Column): Column =
    call_function("graft_pixel_rank_map", pixels, targets)

  /** Native focus stacking: per-pixel best-local-sharpness composite
    * over a z-stack of `(z, pixels)` structs; returns
    * `struct(pixels, zmap)`. */
  def focus_stack(stack: Column, sx: Column): Column =
    call_function("graft_focus_stack", stack, sx)

  /** Native BPE encode of one token against a trained merge list
    * (rank order = array order). */
  def bpe_encode(token: Column, lefts: Array[String],
      rights: Array[String]): Column =
    call_function("graft_bpe_encode", token, lit(lefts), lit(rights))

  /** Native elementwise fold of a plane stack (`how` = "max" | "mean")
    * — the Z-projection kernel. */
  def plane_fold(stack: Column, how: String): Column =
    call_function("graft_plane_fold", stack, lit(how))

  /** Closed-form synthetic plane `[(base + p) % 65536 | p <- 0..n-1]`
    * — one native loop per plane for the synthetic corpus generator. */
  def synth_ramp(base: Column, n: Column): Column =
    call_function("graft_synth_ramp", base, n)

  /** Native long sum of an int-array plane (identical value to the
    * `aggregate(pixels, 0L, _+_)` fold, without per-element boxing). */
  def pixel_sum(pixels: Column): Column =
    call_function("graft_pixel_sum", pixels)

  /** Native exact-integer nearest-centroid assignment (lowest-id ties)
    * against a flattened micro-unit codebook — the Lloyd-trainer
    * kernel. */
  def micro_argmin(qx: Column, ids: Array[Long],
      book: Array[Long]): Column =
    call_function("graft_micro_argmin", qx, lit(ids), lit(book))

  /** Native exact squared-L2 between two long-array COLUMNS (integer
    * micro-units) — the probe-vs-disk-codebook pairwise kernel: lets
    * cell ranking join against a centroids table instead of embedding
    * the codebook in the plan. */
  def micro_l2(a: Column, b: Column): Column =
    call_function("graft_micro_l2", a, b)

  /** Native element-wise long-sum AGGREGATE over int-array planes
    * (fixed-size mergeable buffer — the flat-field substrate). */
  def pixel_sum_agg(pixels: Column): Column =
    call_function("graft_pixel_sum_agg", pixels)

  /** Native count of plane pixels >= threshold (saturation detector). */
  def pixel_count_ge(pixels: Column, threshold: Column): Column =
    call_function("graft_pixel_count_ge", pixels, threshold)

  /** Native Brenner focus score (sum of squared horizontal
    * second-differences) of a flat sx-wide plane. */
  def pixel_brenner(pixels: Column, sx: Column): Column =
    call_function("graft_pixel_brenner", pixels, sx)

  /** Native exact integer dot product of two pixel planes (the moment
    * kernel behind channel colocalization). */
  def pixel_dot(a: Column, b: Column): Column =
    call_function("graft_pixel_dot", a, b)

  /** Native content-defined chunk boundaries: 1-based code-point
    * positions where the trailing-`window` polynomial hash lands on a
    * `2^maskBits` multiple (expected chunk length ~2^maskBits chars). */
  def cdc_boundaries(text: Column, window: Int, maskBits: Int): Column =
    call_function("graft_cdc_boundaries", text, lit(window), lit(maskBits))
}
