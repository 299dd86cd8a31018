package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: `audio_fp(payload)` — a 64-bit
  * Haitsma–Kalker-style perceptual fingerprint of a RIFF/WAVE PCM16 mono
  * payload, the audio twin of [[ImageDHash]].
  *
  * Recipe (the published robust-audio-hashing family: Haitsma & Kalker,
  * "A Highly Robust Audio Fingerprinting System", ISMIR 2002; chromaprint
  * uses the same sign-of-band-energy-difference core): split the sample
  * stream into 17 equal time frames; per frame compute 5 integer
  * band-energy proxies
  * {{{
  *   E0 = Σ|x_i|                 (overall level)
  *   E1 = Σ|x_i − x_{i−1}|       (first difference — high-band proxy)
  *   E2 = Σ|x_i + x_{i−1}|       (first sum — low-band proxy)
  *   E3 = Σ|x_i − x_{i−2}|       (second-lag difference)
  *   E4 = Σ|x_i + x_{i−2}|       (second-lag sum)
  * }}}
  * (difference/sum filters are the classic two-tap high/low-pass pair —
  * band energies without an FFT, integer-exact and order-independent),
  * then set bit `f·4 + m` (f ∈ 0..15, m ∈ 0..3) iff the band-energy
  * difference `E(f,m) − E(f,m+1)` INCREASED from frame f to frame f+1 —
  * the sign of a time-frequency double difference, exactly H&K eq. (1).
  * 16 frame transitions × 4 band transitions = 64 bits.
  *
  * Signs of frame-level energy double-differences survive bounded
  * per-sample noise (a ±δ perturbation moves each Σ by ≤ 2kδ, tiny against
  * typical frame-energy swings), which is what makes the hash perceptual:
  * a re-recorded near-copy lands within a small Hamming radius and joins
  * through the same 4×16-bit chunk machinery text SimHash and image dHash
  * use ([[graft.dedup.SimHash.nearDuplicatesFromSignatures]]).
  *
  * Why native: decode→frame→hash runs per row inside whole-stage codegen
  * (one static call, same pattern as [[ImageDHash]]); the RIFF walk is
  * [[graft.multimodal.Audio.locateData]] — one parser, every stage. All
  * arithmetic is integer (Long sums of ≤ 2^17-bounded terms), so codegen,
  * interpreted, and any future SQL replay agree bit-for-bit.
  */
case class AudioFingerprint(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audio_fp requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "audio_fp"

  override def nullSafeEval(input: Any): Any =
    AudioFingerprint.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.AudioFingerprint.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioFingerprint {

  /** 17 frames → 16 transitions; 5 bands → 4 transitions; 16·4 = 64 bits. */
  private val Frames = 17
  private val Bands = 5

  /** Static codegen entry point (also the interpreted eval body). Malformed
    * payloads fail loudly via the shared RIFF walker — corrupt media should
    * surface, not hash to garbage. Frame boundaries are `f·n div Frames`,
    * and the lag-1/lag-2 filters run WITHIN a frame only (no cross-frame
    * terms), so each frame's energies depend on its own samples alone —
    * a local edit perturbs at most two transitions' bits. */
  def compute(b: Array[Byte]): Long = {
    val (_, dataPos, n) = graft.multimodal.Audio.locateData(-1L, b)
    require(n >= 2 * Frames, s"audio_fp needs >= ${2 * Frames} samples, got $n")
    // e(f)(m): Long sums of |int16 ± int16| terms — ≤ n·2^17 << 2^63
    val e = Array.ofDim[Long](Frames, Bands)
    var f = 0
    while (f < Frames) {
      val lo = (f.toLong * n / Frames).toInt
      val hi = ((f + 1).toLong * n / Frames).toInt
      var i = lo
      while (i < hi) {
        val x = graft.multimodal.Audio.sampleLe16(b, dataPos, i)
        e(f)(0) += math.abs(x)
        if (i - 1 >= lo) {
          val p = graft.multimodal.Audio.sampleLe16(b, dataPos, i - 1)
          e(f)(1) += math.abs(x - p)
          e(f)(2) += math.abs(x + p)
        }
        if (i - 2 >= lo) {
          val q = graft.multimodal.Audio.sampleLe16(b, dataPos, i - 2)
          e(f)(3) += math.abs(x - q)
          e(f)(4) += math.abs(x + q)
        }
        i += 1
      }
      f += 1
    }
    var hash = 0L
    f = 0
    while (f < Frames - 1) {
      var m = 0
      while (m < Bands - 1) {
        val d1 = e(f + 1)(m) - e(f + 1)(m + 1)
        val d0 = e(f)(m) - e(f)(m + 1)
        if (d1 - d0 > 0) hash |= 1L << (f * 4 + m)
        m += 1
      }
      f += 1
    }
    hash
  }

  /** Column-API entry point (register-and-call, same pattern as
    * [[ImageDHash]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("audio_fp", payload)
  }
}
