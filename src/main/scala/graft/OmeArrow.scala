package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.OmeOps
import graft.schema.OmeSchema
import graft.sources.OmeParquet

/**
 * User-facing façade mirroring the reference's polymorphic `OMEArrow`
 * class API (reference: core.py:46-135 read dispatch, core.py:137-267
 * export dispatch, core.py:269-492 sugar) — DataFrame-first: every entry
 * point returns/accepts a DataFrame with a canonical `ome_arrow` column,
 * so all rows stay queryable instead of one record at a time.
 */
object OmeArrow {

  /** Polymorphic read (core.py:46-135 sniffing order): bracket/star
    * pattern -> stack assembly; .zarr -> (deferred); .parquet/.pq ->
    * OME-Parquet; .tif/.tiff -> TIFF. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase.stripSuffix("/")
    // A bare glob over TIFFs (no bracket tokens) is a corpus read — one
    // record per file via Hadoop globbing — not a stack pattern. Paths
    // carrying regex-only metacharacters (\ ( ) + ^ $ |) still route to
    // the pattern reader's regex fallback; to force regex semantics for
    // an ambiguous ".*"-style pattern, call OmeStack.readPattern directly.
    // TIFF and Zarr route through the DataSourceV2 sources so façade
    // reads get Catalyst nested-column pushdown for free: metadata
    // queries decode TIFF headers / Zarr JSON only (see sources/v2)
    if (!path.contains('<') && path.contains('*') &&
        !path.exists("\\()+^$|".contains(_)) &&
        lower.matches(""".*\.tiff?\*?"""))
      spark.read.format("ometiff").load(path)
    else if (path.exists(c => c == '<' || c == '>' || c == '*'))
      sources.OmeStack.readPattern(spark, path)
    else if (lower.endsWith(".zarr") || lower.endsWith(".ome.zarr"))
      spark.read.format("omezarr").load(path)
    else if (lower.endsWith(".parquet") || lower.endsWith(".pq"))
      OmeParquet.read(spark, path)
    else if (lower.endsWith(".tif") || lower.endsWith(".tiff"))
      spark.read.format("ometiff").load(path)
    else {
      // a directory of `*.zarr` stores is a corpus read (one record per
      // store); cheap driver-side probe
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val zarrCorpus = fs.exists(p) && fs.getFileStatus(p).isDirectory &&
        fs.listStatus(p).exists(st =>
          st.isDirectory && st.getPath.getName.endsWith(".zarr"))
      if (zarrCorpus) spark.read.format("omezarr").load(path)
      else throw new IllegalArgumentException(
        s"Cannot infer format of '$path': expected a filename pattern " +
          "(<range>/*), .parquet/.pq, .tif(f), a .zarr store, or a " +
          "directory of .zarr stores.")
    }
  }

  /** Export dispatch with the reference's `how` alias normalization
    * (core.py:219: lowercase, '_' -> '-') and its writer kwargs
    * (export.py:115-127, 231-247): `compression` (tiff: zlib/packbits/
    * none; zarr: zlib/blosc/null), `tile` (tiff, (Y, X)),
    * `multiscaleLevels` and `zarrFormat` (zarr), `useChannelColors`
    * (tiff). Options irrelevant to the chosen sink are ignored, like
    * the reference's kwargs. */
  def export(df: DataFrame, how: String, out: String = null,
      columnName: String = OmeSchema.DefaultColumn,
      column: String = OmeSchema.DefaultColumn,
      compression: String = null,
      tile: Option[(Int, Int)] = None,
      multiscaleLevels: Int = 1,
      zarrFormat: Int = 2,
      useChannelColors: Boolean = false): DataFrame = {
    // `column` names the INPUT record column on `df` (every sink);
    // `columnName` is the parquet OUTPUT column (reference raw-writer
    // default "image" vs class default "ome_arrow", export.py:380)
    def requireOut(): String = {
      require(out != null, s"Export how='$how' requires an output path.")
      out
    }
    how.toLowerCase.replace("_", "-") match {
      case "numpy" | "dense" =>
        OmeOps.toDense(df, column)
      case "ome-parquet" | "omeparquet" | "parquet" =>
        OmeParquet.write(df, requireOut(), columnName = columnName,
          sourceColumn = column)
        df
      case "ome-tiff" | "ometiff" | "tiff" =>
        sources.OmeTiff.write(df, requireOut(), column = column,
          compression = Option(compression).getOrElse("zlib"),
          tile = tile, useChannelColors = useChannelColors)
        df
      case "ome-zarr" | "omezarr" | "zarr" =>
        sources.OmeZarr.write(df, requireOut(),
          multiscaleLevels = multiscaleLevels,
          compressor = Option(compression).getOrElse("zlib"),
          zarrFormat = zarrFormat, column = column)
        df
      case other =>
        throw new IllegalArgumentException(s"Unknown export how='$other'.")
    }
  }

  /** Sugar delegates (core.py:269-492). */
  def info(df: DataFrame): DataFrame = OmeOps.describe(df)

  def slice(df: DataFrame, xMin: Int, xMax: Int, yMin: Int, yMax: Int,
      tIndices: Option[Seq[Int]] = None, cIndices: Option[Seq[Int]] = None,
      zIndices: Option[Seq[Int]] = None, fillMissing: Boolean = true): DataFrame =
    OmeOps.sliceOmeArrow(df, xMin, xMax, yMin, yMax,
      tIndices, cIndices, zIndices, fillMissing)
}
