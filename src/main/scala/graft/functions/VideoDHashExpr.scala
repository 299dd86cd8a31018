package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: `video_dhash(payload, stride)` — a 64-bit
  * perceptual signature of a concatenated-P6 video payload, built as the
  * MAJORITY-BIT FOLD of the per-frame [[ImageDHash]] values over every
  * `stride`-th frame.
  *
  * Per-frame dHash is the standard perceptual image signature; folding
  * sampled frames' hashes by per-bit majority (bit set iff set in a strict
  * majority of sampled frames; ties → 0) is the standard keyframe-voting
  * reduction to one signature per clip — robust where single-frame hashing
  * is not: a re-encode that perturbs one frame moves at most that frame's
  * vote, and the Hamming distance between two clips' signatures degrades
  * gracefully with the fraction of differing frames.
  *
  * The frame walk is [[graft.multimodal.Video.parseFrameHeader]]'s
  * skip-by-header scan — every frame header parsed, only sampled frames'
  * planes touched (and only O(9·8) pixels of each via
  * [[ImageDHash.hashPlane]], in place, no per-frame copy) — and the result
  * feeds the same 4×16-bit Hamming-bucket join as text SimHash, image
  * dHash and audio fingerprints
  * ([[graft.dedup.SimHash.nearDuplicatesFromSignatures]]), closing the
  * video cell of the modality×dedup matrix. Integer-exact end-to-end, so
  * a SQL oracle replays frame grid, gradient signs and majority votes
  * from the pixel recurrence.
  *
  * `stride` is a Scala-side parameter (resolved at plan time, like
  * [[MinWindowHash]]'s k): the sampling rate is operator configuration,
  * not data.
  */
case class VideoDHash(child: Expression, stride: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (stride < 1) TypeCheckResult.TypeCheckFailure(
      s"video_dhash stride must be >= 1, got $stride")
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"video_dhash requires binary, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "video_dhash"

  override def nullSafeEval(input: Any): Any =
    VideoDHash.compute(input.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.VideoDHash.compute($c, $stride);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoDHash {

  /** The per-sampled-frame dHash stream: walk the concatenated stream
    * exactly like [[graft.multimodal.Video.sampleVideo]] (`frame % stride
    * == 0` is sampled), hash each sampled frame's plane in place. Shared
    * by the majority fold ([[compute]]) and the un-folded
    * [[VideoFrameDHashes]] expression. */
  def computeFrames(b: Array[Byte], stride: Int): Array[Long] = {
    require(stride >= 1, s"bad stride $stride")
    val out = Array.newBuilder[Long]
    var pos = 0
    var f = 0
    while (pos < b.length) {
      val (w, h, px) = graft.multimodal.Video.parseFrameHeader(-1L, b, pos)
      if (f % stride == 0) out += ImageDHash.hashPlane(b, w, h, px)
      pos = px + 3 * w * h // skipped frames cost only their header parse
      f += 1
    }
    require(f > 0, "empty video payload")
    out.result()
  }

  /** Static codegen entry point (also the interpreted eval body):
    * per-bit strict-majority fold of [[computeFrames]]. */
  def compute(b: Array[Byte], stride: Int): Long = {
    val fhs = computeFrames(b, stride)
    var hash = 0L
    var bit = 0
    while (bit < 64) {
      var ones = 0
      var i = 0
      while (i < fhs.length) {
        if (((fhs(i) >>> bit) & 1L) == 1L) ones += 1
        i += 1
      }
      if (2 * ones > fhs.length) hash |= 1L << bit
      bit += 1
    }
    hash
  }

  /** Column-API entry point (register-and-call, same pattern as
    * [[ImageDHash]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            payload: org.apache.spark.sql.Column,
            stride: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("video_dhash", payload,
      org.apache.spark.sql.functions.lit(stride))
  }
}

/** Native Catalyst expression: `video_frame_dhashes(payload, stride)` —
  * the UN-FOLDED per-sampled-frame [[ImageDHash]] stream of a
  * concatenated-P6 video payload, one 64-bit hash per sampled frame
  * (element i is the hash of frame i·stride).
  *
  * This is the cross-modal primitive: where [[VideoDHash]] reduces a clip
  * to one signature for clip-vs-clip dedup, the frame stream lets clips
  * join against STILL-IMAGE signature tables — "which clips contain a
  * frame perceptually matching a known image" (blocklist screening,
  * provenance tracing) — via `posexplode` + the same 4×16-bit
  * Hamming-chunk machinery
  * ([[graft.multimodal.VideoDedup.framesMatchingImages]]). Same
  * skip-by-header walk: skipped frames cost O(header), sampled frames
  * O(9·8) pixels, in place.
  */
case class VideoFrameDHashes(child: Expression, stride: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (stride < 1) TypeCheckResult.TypeCheckFailure(
      s"video_frame_dhashes stride must be >= 1, got $stride")
    else child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"video_frame_dhashes requires binary, got ${other.simpleString}")
    }
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "video_frame_dhashes"

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VideoDHash.computeFrames(input.asInstanceOf[Array[Byte]], stride))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.VideoDHash.computeFrames($c, $stride));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoFrameDHashes {
  /** Column-API entry point (register-and-call). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            payload: org.apache.spark.sql.Column,
            stride: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("video_frame_dhashes",
      payload, org.apache.spark.sql.functions.lit(stride))
  }
}
