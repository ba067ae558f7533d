package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.OmeOps
import graft.schema.Fixtures

/**
 * Streaming imaging analytics — the live counterpart of the
 * segmentation surface: planes arriving continuously (an acquisition
 * system dropping files, cf. [[OmeStreamIngest]]) are segmented and
 * measured AS THEY LAND. Segmentation is per-plane and stateless, so
 * the streaming formulation needs no watermark or state store: each
 * micro-batch runs the same native union-find kernel the batch
 * operator uses, and results append exactly once per plane.
 */
object OmeStream {

  /** Explicit plane-feed schema (streaming file sources cannot infer). */
  val planeSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("t", IntegerType),
    StructField("c", IntegerType),
    StructField("z", IntegerType),
    StructField("size_x", IntegerType),
    StructField("size_y", IntegerType),
    StructField("pixels", ArrayType(IntegerType))))

  /** the shared check mask: the modular pattern `ome_segment` pins. */
  private def segMask = transform(col("pixels"),
    v => when((v * v) % 7 < 2, lit(1)).otherwise(lit(0)))

  /** per-plane object count + total foreground area over a plane feed
    * — in-row over the kernel's object array, no explode, no state. */
  private def segmentCounts(planes: DataFrame): DataFrame =
    planes.select(col("image_id"), col("t"), col("c"), col("z"),
      graft.functions.cc_objects(segMask, col("size_x").cast("int"))
        .as("objs"))
      .select(col("image_id"), col("t"), col("c"), col("z"),
        size(col("objs")).cast("long").as("n_objects"),
        coalesce(aggregate(transform(col("objs"),
          o => o.getField("area").cast("long")), lit(0L), _ + _), lit(0L))
          .as("total_area"))

  /** STREAMING per-plane segmentation counts from a parquet feed dir. */
  def segmentCountStream(spark: SparkSession, feedDir: String): DataFrame = {
    graft.functions.ensureRegistered(spark)
    segmentCounts(spark.readStream.schema(planeSchema).parquet(feedDir))
  }

  /**
   * Structural check: the streamed per-plane segmentation must agree
   * with the batch [[OmeOps.segmentObjects]]-equivalent computation
   * plane-for-plane — counts AND areas, exactly. One row of zeros when
   * they do; `empty_stream` flags a vacuous pass.
   */
  def segmentCheck(spark: SparkSession,
      feedDir: String = "/tmp/graft_stream_omeseg_feed",
      timeoutMs: Long = 300000L): DataFrame = {
    graft.functions.ensureRegistered(spark)
    val streamed = StreamDrain.once(spark, "graft_stream_omeseg_check",
        s"corpus4d|$feedDir", timeoutMs)({
      OmeOps.explodePlanes(Fixtures.corpus4d(spark))
        .select(col("image_id"), col("t"), col("c"), col("z"),
          col("size_x").cast("int").as("size_x"),
          col("size_y").cast("int").as("size_y"), col("pixels"))
        .write.mode("overwrite").parquet(feedDir)
      segmentCountStream(spark, feedDir)
    })
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("n_objects").as("n_s"), col("total_area").as("a_s"))
    val batch = segmentCounts(
      spark.read.schema(planeSchema).parquet(feedDir))
      .select(col("image_id"), col("t"), col("c"), col("z"),
        col("n_objects").as("n_b"), col("total_area").as("a_b"))
    batch.join(streamed, Seq("image_id", "t", "c", "z"), "full_outer")
      .agg(
        coalesce(sum(when(col("n_s").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("missing_plane"),
        coalesce(sum(when(col("n_b").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("extra_plane"),
        coalesce(sum(when(col("n_b").isNotNull && col("n_s").isNotNull &&
          col("n_b") =!= col("n_s"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("bad_count"),
        coalesce(sum(when(col("a_b").isNotNull && col("a_s").isNotNull &&
          col("a_b") =!= col("a_s"), 1L).otherwise(0L)), lit(0L))
          .cast("long").as("bad_area"))
      .crossJoin(broadcast(streamed.agg(
        (count(lit(1)) === 0).cast("long").as("empty_stream"))))
  }

  /** Explicit object-feed schema (streaming file sources cannot infer). */
  val objectSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("c", IntegerType),
    StructField("z", IntegerType),
    StructField("t", IntegerType),
    StructField("label", IntegerType),
    StructField("cy", DoubleType),
    StructField("cx", DoubleType)))

  /** One object on the tracking stream. */
  case class ObjIn(image_id: String, c: Int, z: Int, t: Int, label: Int,
      cy: Double, cx: Double)

  /** A tracked object carried in per-stack state: position + the
    * track's root identity. */
  case class TrackedObj(label: Int, cy: Double, cx: Double,
      rootT: Int, rootLabel: Int)

  /** Per-stack state: the LAST processed frame index and its tracked
    * objects — one frame of objects per (image, c, z), never history. */
  case class StackState(lastT: Int, objs: List[TrackedObj])

  /** Streamed assignment: the object plus its track identity. */
  case class TrackAssign(image_id: String, c: Int, z: Int, t: Int,
      label: Int, track_t: Int, track_label: Int)

  /**
   * STREAMING object tracking — live microscopy's "follow the cells as
   * frames land": segmented objects arrive as a stream, keyed by stack
   * (image, c, z), and each frame links to the PREVIOUS frame held in
   * state by exactly [[OmeOps.trackAssignments]]' mutual-nearest rule
   * (squared centroid distance within `maxDisp`, ties by partner
   * label, reciprocal rank-1 — the same total order, so a single-batch
   * feed reproduces the batch assignment object-for-object, certified
   * by [[trackCheck]]). Matched objects inherit the track root; a
   * skipped frame or an out-of-range jump starts fresh roots (NO gap
   * closing on the stream — bridging needs the future, which a live
   * tracker does not have; run the batch `maxGap` pass on the archived
   * corpus).
   *
   * State is ONE frame of objects per stack — `(lastT, objects)` —
   * never history; frames within a micro-batch process in ascending t,
   * so multi-frame batches chain correctly. A LATE frame (t at or
   * before the stack's last processed frame) emits singleton tracks
   * and leaves state UNTOUCHED — rewinding state would relink the next
   * in-order frame against the stale late frame and corrupt every
   * downstream root; exact late-data linking is the batch operator's
   * job on the archive. No timeout: an idle stack resumes tracking
   * when its next frame arrives (state size is objects-per-frame,
   * which microscopy bounds at thousands).
   */
  def trackStream(objects: DataFrame,
      maxDisp: Double = 3.0): org.apache.spark.sql.Dataset[TrackAssign] = {
    require(maxDisp > 0, "trackStream: maxDisp must be positive")
    val spark = objects.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val d2max = maxDisp * maxDisp
    val events = objects.select(col("image_id"),
      col("c").cast("int").as("c"), col("z").cast("int").as("z"),
      col("t").cast("int").as("t"), col("label").cast("int").as("label"),
      col("cy").cast("double").as("cy"), col("cx").cast("double").as("cx"))
      .as[ObjIn]
    events.groupByKey(o => (o.image_id, o.c, o.z))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (key: (String, Int, Int), it: Iterator[ObjIn],
         state: GroupState[StackState]) => {
          var st = state.getOption.getOrElse(StackState(Int.MinValue, Nil))
          val out = scala.collection.mutable.ArrayBuffer[TrackAssign]()
          def d2(p: TrackedObj, o: ObjIn): Double =
            (o.cy - p.cy) * (o.cy - p.cy) + (o.cx - p.cx) * (o.cx - p.cx)
          val frames = it.toArray.sortBy(o => (o.t, o.label))
            .groupBy(_.t).toSeq.sortBy(_._1)
          for ((t, objs) <- frames) {
            if (t <= st.lastT) {
              // LATE frame (t already processed or passed): emit its
              // objects as singleton tracks WITHOUT touching state — a
              // state rewind would make the next in-order frame link
              // against the stale late frame and corrupt every
              // downstream root (r12 advice). Live linking needs order;
              // replay the batch linker on the archive for exactness.
              objs.foreach(o => out += TrackAssign(o.image_id, o.c, o.z,
                o.t, o.label, o.t, o.label))
            } else {
            val prev = if (t == st.lastT + 1) st.objs else Nil
            val tracked = objs.map { o =>
              // wDst rank-1: o's best predecessor by (d2, la)
              val cands = prev.filter(p => d2(p, o) <= d2max)
              val link =
                if (cands.isEmpty) None
                else {
                  val best = cands.minBy(p => (d2(p, o), p.label))
                  // wSrc rank-1 back-check: is o best's best successor
                  // by (d2, lb)? reciprocal rank-1 = the batch rule
                  val back = objs.filter(o2 => d2(best, o2) <= d2max)
                    .minBy(o2 => (d2(best, o2), o2.label))
                  if (back.label == o.label) Some(best) else None
                }
              link match {
                case Some(p) =>
                  TrackedObj(o.label, o.cy, o.cx, p.rootT, p.rootLabel)
                case None =>
                  TrackedObj(o.label, o.cy, o.cx, o.t, o.label)
              }
            }
            objs.zip(tracked).foreach { case (o, tr) =>
              out += TrackAssign(o.image_id, o.c, o.z, o.t, o.label,
                tr.rootT, tr.rootLabel)
            }
            st = StackState(t, tracked.toList)
            }
          }
          state.update(st)
          out.iterator
        })
  }

  /**
   * Structural self-check of [[trackStream]] against
   * [[OmeOps.trackAssignments]] (all-zeros pattern): the object corpus
   * streams as ONE batch (frames chain in order inside it), so every
   * streamed (object → track identity) must equal the batch linker's.
   * Violations: `missing_obj` (batch object the stream never
   * assigned), `extra_obj`, `track_mismatch` (root identity differs),
   * `dup_obj`, `empty_stream`.
   */
  def trackCheck(spark: SparkSession, objects: DataFrame,
      maxDisp: Double = 3.0,
      feedDir: String = "/tmp/graft_stream_track_feed",
      timeoutMs: Long = 300000L): DataFrame = {
    // no `inputs` signature: the feed is (re)written INSIDE the thunk,
    // so signing it would invalidate the memo after every drain (each
    // parquet rewrite changes mtimes). Caller contract: one objects
    // frame per (feedDir, process) — the registry feeds the
    // deterministic synthetic corpus.
    val streamed = StreamDrain.once(spark, "graft_stream_track_check",
        s"$maxDisp|$feedDir", timeoutMs)({
      objects.select(col("image_id"),
        col("c").cast("int").as("c"), col("z").cast("int").as("z"),
        col("t").cast("int").as("t"),
        col("label").cast("int").as("label"),
        col("cy").cast("double").as("cy"),
        col("cx").cast("double").as("cx"))
        .write.mode("overwrite").parquet(feedDir)
      trackStream(
        spark.readStream.schema(objectSchema).parquet(feedDir),
        maxDisp).toDF()
    })
      .select(col("image_id"), col("c"), col("z"), col("t"), col("label"),
        col("track_t").as("s_tt"), col("track_label").as("s_tl"))
    val batch = OmeOps.trackAssignments(objects, maxDisp)
      .select(col("image_id"), col("c"), col("z"), col("t"), col("label"),
        col("track_t").as("b_tt"), col("track_label").as("b_tl"))
    val keys = Seq("image_id", "c", "z", "t", "label")
    val joined = batch.join(streamed, keys, "full_outer")
      .agg(
        coalesce(sum(when(col("s_tt").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("missing_obj"),
        coalesce(sum(when(col("b_tt").isNull, 1L).otherwise(0L)), lit(0L))
          .cast("long").as("extra_obj"),
        coalesce(sum(when(col("b_tt").isNotNull && col("s_tt").isNotNull &&
          (col("b_tt") =!= col("s_tt") || col("b_tl") =!= col("s_tl")),
          1L).otherwise(0L)), lit(0L)).cast("long").as("track_mismatch"))
    val dup = streamed
      .groupBy(col("image_id"), col("c"), col("z"), col("t"), col("label"))
      .agg(count(lit(1)).as("nw"))
      .agg(coalesce(sum(when(col("nw") > 1, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("dup_obj"))
    val empty = streamed.agg(
      (count(lit(1)) === 0).cast("long").as("empty_stream"))
    joined.crossJoin(broadcast(dup)).crossJoin(broadcast(empty))
  }
}
