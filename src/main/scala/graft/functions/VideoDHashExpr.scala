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

  /** Static codegen entry point (also the interpreted eval body). Walks
    * the concatenated stream exactly like
    * [[graft.multimodal.Video.sampleVideo]] (`frame % stride == 0` is
    * sampled), accumulates per-bit votes, folds by strict majority. */
  def compute(b: Array[Byte], stride: Int): Long = {
    require(stride >= 1, s"bad stride $stride")
    val votes = new Array[Int](64)
    var nSampled = 0
    var pos = 0
    var f = 0
    while (pos < b.length) {
      val (w, h, px) = graft.multimodal.Video.parseFrameHeader(-1L, b, pos)
      if (f % stride == 0) {
        val fh = ImageDHash.hashPlane(b, w, h, px)
        var bit = 0
        while (bit < 64) {
          if (((fh >>> bit) & 1L) == 1L) votes(bit) += 1
          bit += 1
        }
        nSampled += 1
      }
      pos = px + 3 * w * h // skipped frames cost only their header parse
      f += 1
    }
    require(f > 0, "empty video payload")
    var hash = 0L
    var bit = 0
    while (bit < 64) {
      if (2 * votes(bit) > nSampled) hash |= 1L << bit
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
