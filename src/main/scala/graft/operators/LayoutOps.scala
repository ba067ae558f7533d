package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Physical data-layout operators — the write-side techniques that
 * make 100 TB scans cheap before any query runs: multi-dimensional
 * clustering so parquet min/max stats prune on more than one column.
 */
object LayoutOps {

  /**
   * Attach the Z-order clustering key: `z` = Morton interleave of the
   * low `bits` bits of the two columns (values folded into the 2^bits
   * grid by modulo, so arbitrary key ranges cluster without a stats
   * pass). Sorting by `z` keeps rows close in EITHER dimension close
   * on disk — the Delta/Iceberg Z-ORDER layout as a plain expression.
   */
  def zorder(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16): DataFrame = {
    graft.functions.ensureRegistered(df.sparkSession)
    val mask = lit((1L << bits) - 1)
    df.withColumn("z", graft.functions.z_value(
      col(xCol).cast("long").bitwiseAND(mask),
      col(yCol).cast("long").bitwiseAND(mask), bits))
  }

  /**
   * Write `df` Z-ordered across `numFiles` parquet files:
   * range-partition on `z` (sampled range boundaries — balanced
   * files without a global sort) and sort within each partition, so
   * every file covers a compact z-range and its x/y column stats
   * cover a tight rectangle of the key grid.
   */
  def writeZordered(df: DataFrame, path: String, xCol: String,
      yCol: String, bits: Int = 16, numFiles: Int = 8): Unit =
    zorder(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(path)

  /**
   * Small-file compaction: rewrite a parquet directory into
   * `ceil(total_bytes / targetBytes)` files — the operational fix for
   * the small-file problem (a 100 TB table accreted from streaming
   * micro-batches or over-parallel writes pays footer/open overhead
   * per file and floods the driver's file listing; NameNode-scale
   * metadata pressure is the classic failure). Sizing reads ONLY the
   * directory listing; the data moves once through a round-robin
   * repartition (no keys — pure file-count surgery, content
   * preserved as a multiset).
   *
   * Partitioned (Hive-layout) tables: a directory whose children are
   * subdirectories (`path/day=…/`) recurses and compacts each leaf
   * partition IN PLACE, preserving the directory structure — each
   * leaf's files stay inside their partition dir, so partition
   * columns, pruning, and discovery are untouched (the flat-path
   * sizing alone would see zero files, read the whole table through
   * Spark's recursive reader, and flatten it to one file). Hidden
   * children (`_`/`.` prefixes, e.g. `_SUCCESS`) are ignored. A
   * mixed layout (data files AND partition subdirectories at the
   * same level — not a valid Hive table) compacts only the
   * subtrees and leaves the loose root files untouched.
   *
   * Swap discipline per leaf: the rewrite lands in a DOT-PREFIXED
   * sibling `.compact.tmp.<leaf>`, then two renames swap it in, and
   * a failed second rename restores the original directory — a crash
   * can strand a `.compact.tmp.<leaf>`/`.compact.old.<leaf>` sibling
   * but never loses the table. The dot prefix matters for
   * partitioned tables, where the sibling lives INSIDE the table
   * root: Hadoop/Spark's hidden-path filter skips `.`-prefixed
   * directories during partition discovery, so a stranded staging
   * dir can never surface as a phantom partition that duplicates the
   * leaf's rows on read. Every compaction pass also sweeps stranded
   * staging dirs from a previous crashed run first: `.compact.old.X`
   * with no live `X` is the original mid-swap — restored by rename;
   * with a live `X` it is a stale copy — deleted; `.compact.tmp.X`
   * is regenerable — deleted. Readers racing the swap window
   * (between the two renames) can see the path briefly missing;
   * compaction is an offline/maintenance operation, not a
   * concurrent-reader-safe commit protocol (that is a table format's
   * job — Delta/Iceberg). Returns (files_before, files_after) summed
   * over leaves.
   */
  def compactParquet(spark: SparkSession, path: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetBytes > 0, "compactParquet: targetBytes must be positive")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    // a crashed run may have left `path` itself mid-swap (renamed away
    // to its .compact.old sibling) — recover before listing
    if (!fs.exists(hp) && hp.getParent != null) {
      val bak = new org.apache.hadoop.fs.Path(
        hp.getParent, ".compact.old." + hp.getName)
      if (fs.exists(bak))
        require(fs.rename(bak, hp), s"compactParquet: cannot restore $path")
    }
    sweepCompactStaging(fs, hp)
    val children = fs.listStatus(hp)
    val subdirs = children.filter { s =>
      val n = s.getPath.getName
      // never recurse into staging leftovers — a stranded backup holds
      // a COPY of the original data and compacting it as a partition
      // would double the table (`.`-prefix catches the current naming;
      // the `.compact.` substring catches pre-r12 suffix-style names)
      s.isDirectory && !n.startsWith("_") && !n.startsWith(".") &&
        !n.contains(".compact.")
    }
    if (subdirs.nonEmpty) {
      // partitioned layout: compact each partition subtree in place
      val results =
        subdirs.map(d => compactParquet(spark, d.getPath.toString, targetBytes))
      (results.map(_._1).sum, results.map(_._2).sum)
    } else {
      val parts = children
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (parts.isEmpty) (0, 0) // nothing to compact (empty partition)
      else {
        val total = parts.map(_.getLen).sum
        val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
        val tmp = new org.apache.hadoop.fs.Path(
          hp.getParent, ".compact.tmp." + hp.getName)
        val old = new org.apache.hadoop.fs.Path(
          hp.getParent, ".compact.old." + hp.getName)
        spark.read.parquet(path).repartition(n)
          .write.mode("overwrite").parquet(tmp.toString)
        fs.delete(old, true)
        require(fs.rename(hp, old), s"compactParquet: cannot stage $path")
        try {
          require(fs.rename(tmp, hp), s"compactParquet: cannot swap in $tmp")
        } catch {
          case e: Throwable =>
            // restore the staged original so `path` never ends up missing
            fs.rename(old, hp)
            fs.delete(tmp, true)
            throw e
        }
        fs.delete(old, true)
        val after = fs.listStatus(hp).count(s =>
          s.isFile && s.getPath.getName.endsWith(".parquet"))
        (parts.length, after)
      }
    }
  }

  /**
   * Recover/clean staging dirs stranded among `dir`'s children by a
   * compaction run that crashed between its two swap renames. Covers
   * both the current dot-prefixed names (`.compact.{tmp,old}.<leaf>`)
   * and the pre-r12 suffix names (`<leaf>.compact.{tmp,old}`) — the
   * latter are the read-duplication hazard this sweep retires: a
   * suffix-named backup inside a table root parses as a real Hive
   * partition (e.g. `day=X.compact.old`) and silently duplicates the
   * leaf's rows on the next read.
   */
  private def sweepCompactStaging(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(dir) || !fs.getFileStatus(dir).isDirectory) return
    fs.listStatus(dir).foreach { s =>
      val n = s.getPath.getName
      val leaf =
        if (n.startsWith(".compact.old.")) n.stripPrefix(".compact.old.")
        else if (n.endsWith(".compact.old")) n.stripSuffix(".compact.old")
        else null
      if (n.startsWith(".compact.tmp.") || n.endsWith(".compact.tmp")) {
        fs.delete(s.getPath, true) // tmp is always regenerable
      } else if (leaf != null) {
        val live = new org.apache.hadoop.fs.Path(dir, leaf)
        if (fs.exists(live)) fs.delete(s.getPath, true) // stale copy
        else require(fs.rename(s.getPath, live),
          s"compactParquet: cannot restore $live from crashed staging")
      }
    }
  }

  /**
   * Bucketed plane-table layout — the imaging twin of
   * [[graft.operators.JoinOps.writeBucketed]]: an exploded plane table
   * (`explodePlanes` output) written bucketed+sorted on `image_id`, so
   * EVERY later per-image aggregation — `nestPlanes`, per-image QC
   * rollups, feature joins on `image_id` — reads the bucket
   * partitioning straight off the scan and plans with ZERO exchanges.
   * At 100 TB the plane table is the hot representation (SURVEY §1.4
   * form 2) and per-image re-aggregation is its dominant access
   * pattern; paying the bucket shuffle once at ingest amortizes it
   * across the whole downstream workload. Registers an EXTERNAL table
   * at `path` (explicit location, like `writeBucketed`).
   */
  def writePlanesBucketed(planeDf: DataFrame, table: String, path: String,
      nBuckets: Int): Unit =
    planeDf.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, "image_id").sortBy("image_id")
      .saveAsTable(table)

  /**
   * Clustering-quality report over a written parquet directory: one
   * row per part file with its row count and the min/max of the two
   * key columns — the rectangle a min/max-pruning reader would skip
   * or scan. The quality metric is `avg_extent_frac`: mean of
   * (per-file x-extent / global x-extent + y-extent fraction) / 2 —
   * ~1.0 for an unclustered write (every file spans everything),
   * shrinking toward numFiles^-1/2 under Z-order. Reads only footer
   * stats via a grouped aggregation, no second data pass at scale
   * (the per-file group is what the footer stats would give; exact
   * here so the DuckDB oracle can replay it from the rows).
   */
  def clusteringReport(spark: SparkSession, path: String,
      xCol: String, yCol: String): DataFrame = {
    val df = spark.read.parquet(path)
      .select(col(xCol).cast("long").as("x"),
        col(yCol).cast("long").as("y"),
        input_file_name().as("file"))
    val perFile = df.groupBy(col("file"))
      .agg(count(lit(1)).cast("long").as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
    val global = perFile.agg(
      min(col("x_min")).as("gx_min"), max(col("x_max")).as("gx_max"),
      min(col("y_min")).as("gy_min"), max(col("y_max")).as("gy_max"))
    perFile.crossJoin(broadcast(global))
      .select(col("n_rows"), col("x_min"), col("x_max"),
        col("y_min"), col("y_max"),
        round(((col("x_max") - col("x_min")).cast("double") /
          greatest(col("gx_max") - col("gx_min"), lit(1L)) +
          (col("y_max") - col("y_min")).cast("double") /
            greatest(col("gy_max") - col("gy_min"), lit(1L))) / 2, 6)
          .as("extent_frac"))
  }

  /** Filesystems with PROVEN atomic directory rename — the two-rename
    * swap protocol's entire safety argument (recovery never mistakes a
    * partial copy for a complete index) rests on it, so the guard is an
    * ALLOWLIST that fails safe on anything unknown (ADVICE r17: the
    * previous deny-list silently gave abfs on a flat-namespace Azure
    * account, o3fs, and third-party object-store connectors the unsafe
    * protocol). `null`/empty covers the scheme-less default-FS case,
    * which the call sites re-check against the RESOLVED
    * `FileSystem.getScheme`. Object stores (s3a, gs, abfs, ...) use the
    * pointer-publish lifecycle instead ([[withPointerGeneration]]),
    * which needs no renames at all. */
  private val atomicRenameSchemes = Set("file", "hdfs", "viewfs")

  private def requireAtomicRename(scheme: String, path: String): Unit =
    require(scheme == null || scheme.isEmpty ||
        atomicRenameSchemes.contains(scheme.toLowerCase),
      s"index swap at $path: directory rename on '$scheme' is not " +
        "known-atomic (object stores rename by copy+delete), so a " +
        "crash mid-swap could leave a partial copy posing as a " +
        "complete index — publish through the pointer lifecycle " +
        "instead (LayoutOps.withPointerGeneration / " +
        "resolveIndexPointer, e.g. VectorOps.rebuildIvfIndexPointer: " +
        "write a NEW generation directory, then commit with one " +
        "pointer-object write, which is atomic on every store), or " +
        "host the index on a filesystem with atomic rename " +
        "(hdfs, file, viewfs)")

  private def swapPaths(path: String): (org.apache.hadoop.fs.Path,
      org.apache.hadoop.fs.Path, org.apache.hadoop.fs.Path) = {
    val hp = new org.apache.hadoop.fs.Path(path)
    require(hp.getParent != null,
      s"index swap needs a parented path, got $path")
    requireAtomicRename(hp.toUri.getScheme, path)
    (hp, new org.apache.hadoop.fs.Path(hp.getParent,
      ".rebuild.tmp." + hp.getName),
      new org.apache.hadoop.fs.Path(hp.getParent,
        ".rebuild.old." + hp.getName))
  }

  /** The staging directory an index rebuild writes its full new layout
    * into before [[commitIndexSwap]] publishes it — a dot-prefixed
    * SIBLING of the live path (same filesystem, so the commit renames
    * never copy; invisible to any parquet reader of the parent). */
  private[graft] def indexStagingPath(path: String): String = {
    val (_, tmp, _) = swapPaths(path)
    tmp.toString
  }

  /**
   * Crash-recovery sweep for an interrupted index rebuild
   * ([[graft.operators.VectorOps.rebuildIvfIndex]] /
   * [[graft.operators.TextOps.rebuildBm25Index]]) — the
   * [[compactParquet]] crash-restoring discipline at index-root
   * granularity. A rebuild stages the ENTIRE new index at a
   * dot-prefixed sibling, then commits with two renames (live →
   * `.rebuild.old.<leaf>`, staged → live) and deletes the backup.
   * Every crash window recovers here to a fully-consistent index:
   *
   *  - before the first rename: live untouched — the stranded staging
   *    dir is deleted (always regenerable);
   *  - between the renames: live missing, backup present — the backup
   *    is restored, so the OLD index answers exactly as before the
   *    rebuild started (the staged copy is discarded: restore-old is
   *    the one choice that never has to trust a half-written stage);
   *  - after the second rename: the new index is live — the stale
   *    backup and any staging leftover are deleted.
   *
   * Like compaction, the swap itself is an offline/maintenance
   * operation: a reader scanning between the two renames can see the
   * path briefly missing (concurrent-commit protocols are a table
   * format's job). Idempotent; safe to call on a healthy index.
   *
   * Filesystem contract: the protocol is sound ONLY where directory
   * rename is atomic (HDFS, posix) — on object stores a rename is a
   * copy+delete whose crash leaves a PARTIAL copy the recovery could
   * mistake for a complete index, so the known copy-rename schemes
   * are refused up front (see `nonAtomicRenameSchemes`; spec-pinned
   * on an `s3a:` path).
   */
  def recoverIndexSwap(spark: SparkSession, path: String): Unit = {
    val (hp, tmp, old) = swapPaths(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    requireAtomicRename(fs.getScheme, path) // scheme-less default-FS case
    if (fs.exists(old)) {
      if (fs.exists(hp)) fs.delete(old, true) // stale backup
      else require(fs.rename(old, hp),
        s"recoverIndexSwap: cannot restore $path from $old")
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** The two-rename publish of a staged index rebuild: live →
    * backup, staged → live, delete backup. Callers must have staged a
    * COMPLETE index at [[indexStagingPath]]; crash windows are
    * [[recoverIndexSwap]]'s contract. */
  private[graft] def commitIndexSwap(spark: SparkSession,
      path: String): Unit = {
    val (hp, tmp, old) = swapPaths(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    requireAtomicRename(fs.getScheme, path) // scheme-less default-FS case
    require(fs.exists(tmp), s"commitIndexSwap: nothing staged at $tmp")
    if (fs.exists(hp))
      require(fs.rename(hp, old), s"commitIndexSwap: cannot retire $path")
    require(fs.rename(tmp, hp), s"commitIndexSwap: cannot publish $tmp")
    fs.delete(old, true)
  }

  // --- pointer-publish index lifecycle (object-store safe) -------------

  /** The OTHER publish protocol — for filesystems whose rename is a
    * non-atomic copy+delete (s3a, gs, abfs, ...), where
    * [[commitIndexSwap]]'s two-rename swap is refused. The index ROOT
    * holds numbered generation directories (`gen-00001`, ...) plus a
    * tiny pointer directory `_ptr/` of one-line pointer objects
    * (`ptr-00001` containing exactly `gen-00001`). The LIVE index is the
    * generation named by the highest VALID pointer; publish = write the
    * full new generation, then PUT one new pointer object — a
    * single-object write, atomic on every store (S3 PUTs are
    * all-or-nothing; no rename, no overwrite, nothing in place).
    *
    * Crash windows (every one leaves the old generation serving):
    *  - mid-generation-write: no pointer names it → invisible;
    *    [[recoverPointerSwap]] sweeps the stranded directory;
    *  - mid-pointer-write: a pointer is valid ONLY under
    *    [[pointerTarget]]'s two content forms (publish `gen-<own n>`,
    *    rollback `gen-<m> ptr-<own n>`), both chosen so every strict
    *    prefix fails validation — a torn write can never alias to a
    *    different generation; resolution falls back to the previous
    *    valid pointer and recovery deletes the torn one;
    *  - after the pointer write: publish is complete; recovery prunes
    *    all but the live and the immediately-previous generation (kept
    *    for [[rollbackIndexPointer]]).
    *
    * Like the rename swap, maintenance is single-writer per index root
    * (generation numbers are allocated by listing); READERS are
    * wait-free — [[resolveIndexPointer]] at open, then every query runs
    * against a generation directory that no publish ever mutates.
    * Generations are immutable TO THE PROTOCOL: the standard pure-append
    * APIs (`appendToIvfIndex` & co.) may still target the resolved live
    * generation — they add files, never rename or rewrite published
    * ones, so the pointer's atomicity story is untouched; on an object
    * store their parquet commits inherit Spark's committer semantics
    * (use an object-store-native committer, e.g. the S3A magic
    * committer, as for any parquet append there). Visibility rule
    * (spec-pinned, IndexLifecycleSpec): appends ride the generation
    * they landed in — rows appended to the live generation VANISH on
    * [[rollbackIndexPointer]] (the predecessor predates them) and
    * RETURN when a second rollback rolls forward; an append is only as
    * durable as its generation's place in the retention window. */
  private def pointerDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_ptr")

  // digit count bounded to 18 (ADVICE r18): 18 digits always fit a
  // Long, so a junk 19+-digit name (e.g. ptr-99999999999999999999)
  // is treated as non-matching — the same skip-invalid behavior junk
  // pointer CONTENT gets — instead of toLong throwing and hard-failing
  // resolve/recovery on a file recovery could then never sweep
  private val GenName = "^gen-(\\d{5,18})$".r
  private val PtrName = "^ptr-(\\d{5,18})$".r

  private def genLeaf(n: Long): String = f"gen-$n%05d"

  private def listNumbered(fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path,
      pat: scala.util.matching.Regex): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      st.getPath.getName match {
        case pat(n) => Some((n.toLong, st.getPath))
        case _ => None
      }
    }

  private val RollbackContent = "^gen-(\\d{5,18}) ptr-(\\d{5,18})$".r

  /** The validated TARGET generation of `ptr-<n>`, or None. Two valid
    * content forms, both torn-write-proof (every strict prefix of
    * either fails validation, so a crash mid-write can never alias to
    * a different generation):
    *  - publish: exactly `gen-<n>` — the pointer's OWN number;
    *  - rollback: `gen-<m> ptr-<n>` — any generation, but the second
    *    token must name the pointer itself (a torn prefix loses it).
    * In both forms the named generation directory must exist. */
  private def pointerTarget(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, n: Long,
      ptr: org.apache.hadoop.fs.Path): Option[Long] = {
    val content = try {
      val in = fs.open(ptr)
      try {
        // read to EOF (or 64 bytes — a valid pointer is ~10-24): a
        // SHORT read must not make a good pointer look torn
        val buf = new Array[Byte](64)
        var off = 0
        var got = 0
        while (off < buf.length && got >= 0) {
          got = in.read(buf, off, buf.length - off)
          if (got > 0) off += got
        }
        new String(buf, 0, off, "UTF-8").trim
      } finally in.close()
    } catch { case _: java.io.IOException => "" }
    val target = content match {
      case RollbackContent(m, self) if self.toLong == n => Some(m.toLong)
      case _ if content == genLeaf(n) => Some(n)
      case _ => None
    }
    target.filter(m =>
      fs.exists(new org.apache.hadoop.fs.Path(root, genLeaf(m))))
  }

  /** Valid pointers as `(pointer number, target generation)`, newest
    * pointer first. */
  private def validPointers(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, Long)] =
    listNumbered(fs, pointerDir(root), PtrName).sortBy(-_._1)
      .flatMap { case (n, p) => pointerTarget(fs, root, n, p).map((n, _)) }

  /** The LIVE generation directory of a pointer-published index — what
    * readers open and what [[graft.operators.VectorOps.ivfIndexTopK]]
    * and friends take as their index path. Fails with a build recipe if
    * the root has no published generation. */
  def resolveIndexPointer(spark: SparkSession, root: String): String = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    val live = validPointers(fs, rp).headOption.map(_._2).getOrElse(
      throw new IllegalArgumentException(
        s"resolveIndexPointer: no published generation under $root — " +
          "build into LayoutOps.withPointerGeneration(spark, root)(gen " +
          "=> buildIvfIndex(corpus, gen, ...)) to publish the first one"))
    new org.apache.hadoop.fs.Path(rp, genLeaf(live)).toString
  }

  /** Allocates the next generation directory path under `root` (max of
    * every existing generation/pointer number, plus one) WITHOUT
    * creating it — the caller writes the complete new index there, then
    * [[commitPointerSwap]] publishes it. A crash before the commit
    * leaves the directory unreferenced and invisible. */
  private[graft] def pointerStagingPath(spark: SparkSession,
      root: String): String = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    val used = (listNumbered(fs, rp, GenName) ++
      listNumbered(fs, pointerDir(rp), PtrName)).map(_._1)
    new org.apache.hadoop.fs.Path(rp,
      genLeaf(if (used.isEmpty) 1L else used.max + 1L)).toString
  }

  /** Publishes a staged generation with ONE pointer-object write (the
    * atomic step on every filesystem, object stores included), then
    * prunes: all generations beyond the newest `retain` (>= 2 — the
    * immediate predecessor is always kept for rollback) are deleted,
    * along with their pointers and any torn/stranded leftovers. */
  private[graft] def commitPointerSwap(spark: SparkSession, root: String,
      genPath: String, retain: Int = 2): Unit = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    val gp = new org.apache.hadoop.fs.Path(genPath)
    val n = gp.getName match {
      case GenName(d) => d.toLong
      case other => throw new IllegalArgumentException(
        s"commitPointerSwap: $other is not a gen-<n> directory — stage " +
          "at LayoutOps.pointerStagingPath")
    }
    require(gp.getParent != null &&
        fs.makeQualified(gp.getParent) == fs.makeQualified(rp),
      s"commitPointerSwap: $genPath is not a child of $root")
    require(fs.exists(gp) && fs.listStatus(gp).nonEmpty,
      s"commitPointerSwap: nothing staged at $genPath")
    val ptr = new org.apache.hadoop.fs.Path(pointerDir(rp), f"ptr-$n%05d")
    require(!fs.exists(ptr),
      s"commitPointerSwap: $ptr already exists — maintenance is " +
        "single-writer per index root")
    val out = fs.create(ptr, false)
    try out.write((genLeaf(n) + "\n").getBytes("UTF-8")) finally out.close()
    prunePointerGenerations(fs, rp, retain)
  }

  /** Crash-recovery sweep for a pointer-published index — the
    * [[recoverIndexSwap]] counterpart: deletes torn pointers, stranded
    * unpublished generations, and all history beyond the newest
    * `retain` (default 2: live + predecessor). Idempotent; a no-op on
    * a healthy root; safe before the first publish (nothing valid to
    * keep → only strandeds are swept). */
  def recoverPointerSwap(spark: SparkSession, root: String,
      retain: Int = 2): Unit = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    prunePointerGenerations(fs, rp, retain)
  }

  private def prunePointerGenerations(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path, retain: Int): Unit = {
    require(retain >= 2, // the predecessor is rollback's target
      s"pointer generation retention must keep live+predecessor, got $retain")
    val valid = validPointers(fs, root)
    val keepPtrs = valid.take(retain).map(_._1).toSet
    val keepGens = valid.take(retain).map(_._2).toSet
    listNumbered(fs, pointerDir(root), PtrName).foreach { case (n, p) =>
      if (!keepPtrs.contains(n)) fs.delete(p, false)
    }
    listNumbered(fs, root, GenName).foreach { case (n, p) =>
      if (!keepGens.contains(n)) fs.delete(p, true)
    }
  }

  /** The pointer lifecycle's publish wrapper: recover, allocate the
    * next generation, run `build` against it (write the COMPLETE new
    * index there), commit with the one-object pointer write, and
    * return the now-live generation path. Works identically on `file:`
    * (how the spec simulates it) and on object stores — no step
    * renames or overwrites anything.
    *
    * Reader hazard (ADVICE r18): a reader that resolved the live
    * generation stays correct across ONE publish (its generation
    * becomes the retained predecessor) but a SECOND publish prunes
    * that directory under its scan — missing-file failures, the same
    * exposure as the rename swap's old-dir delete. Where long scans
    * overlap frequent publishes, raise `retain` (generations kept
    * after each publish, default 2 = live + rollback predecessor) so
    * pruning lags the oldest running reader. */
  def withPointerGeneration(spark: SparkSession, root: String,
      retain: Int = 2)(build: String => Unit): String = {
    recoverPointerSwap(spark, root, retain)
    val gen = pointerStagingPath(spark, root)
    build(gen)
    commitPointerSwap(spark, root, gen, retain)
    gen
  }

  /** Re-points the live index to the RETAINED PREDECESSOR generation —
    * the operator the pruning policy keeps that generation for (a
    * rebuild published bad data, roll back while the root cause is
    * found). Implemented as one new pointer-object write in the
    * self-naming rollback form (`gen-<m> ptr-<n>` — see
    * [[resolveIndexPointer]]'s validity rule; still no renames, still
    * atomic, still torn-write-proof), so rollback has the same crash
    * story as publish. The generation rolled back FROM stays retained
    * (it becomes the predecessor), so a second rollback rolls forward
    * again. Refuses when no predecessor generation is retained. Returns
    * the now-live generation path. */
  def rollbackIndexPointer(spark: SparkSession, root: String,
      retain: Int = 2): String = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    val valid = validPointers(fs, rp)
    require(valid.nonEmpty,
      s"rollbackIndexPointer: no published generation under $root")
    val live = valid.head._2
    val prev = valid.collectFirst { case (_, g) if g != live => g }
      .getOrElse(throw new IllegalArgumentException(
        s"rollbackIndexPointer: no predecessor generation retained " +
          s"under $root — only ${genLeaf(live)} is published"))
    val used = (listNumbered(fs, rp, GenName) ++
      listNumbered(fs, pointerDir(rp), PtrName)).map(_._1)
    val n = used.max + 1L
    val ptr = new org.apache.hadoop.fs.Path(pointerDir(rp), f"ptr-$n%05d")
    val out = fs.create(ptr, false)
    try out.write(f"${genLeaf(prev)} ptr-$n%05d\n".getBytes("UTF-8"))
    finally out.close()
    prunePointerGenerations(fs, rp, retain)
    new org.apache.hadoop.fs.Path(rp, genLeaf(prev)).toString
  }
}
