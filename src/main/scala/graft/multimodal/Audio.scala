package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Audio leg of the multimodal plumbing: opaque `binary` WAV payloads with a
  * REAL RIFF/WAVE decoder (cf. reference Prediction_Pipe_Line.py:94-111's
  * stream-of-opaque-records shape; the reference has no audio surface — this
  * is the LLM-data-pipeline extension row).
  *
  * The payload is canonical RIFF: `RIFF <sz> WAVE`, a `fmt ` chunk (PCM16
  * mono), an id-sized `LIST` padding chunk (so the decoder must genuinely
  * WALK chunks rather than assume `data` at byte 36 — real-world WAVs carry
  * LIST/INFO/fact chunks there), then the `data` chunk of little-endian
  * int16 samples. [[decodeWav]] parses all of that per the published RIFF
  * spec and reduces the sample stream to integer stats (count, sum, sum of
  * absolutes, peak) — the loudness/clipping screen an audio-curation pass
  * runs before paying for transcription.
  *
  * Samples come from the same positional-hash recurrence family as
  * [[Multimodal.encodePpm]], so a SQL oracle regenerates every sample
  * without binary: `s(d, i) = ((d·1103515245 + i·12345 + 7) mod 2147483647)
  * mod 65536 − 32768`, all intermediates well inside int64.
  */
object Audio {

  /** Decoded WAV statistics: parsed format fields + integer sample stats. */
  case class WavStats(id: Long, sample_rate: Int, n_samples: Long,
                      sum_amp: Long, sum_abs: Long, peak: Int)

  /** Samples per payload: bounded, id-dependent (256..767). */
  def nSamples(id: Long): Int = (256 + id % 512).toInt

  /** The sample recurrence — public so the spec can replay it locally. */
  def sampleAt(id: Long, i: Int): Int =
    ((((id * 1103515245L + i * 12345L + 7L) % 2147483647L) % 65536L) - 32768L).toInt

  private def putLeInt(b: Array[Byte], pos: Int, v: Int): Unit = {
    b(pos) = (v & 0xff).toByte
    b(pos + 1) = ((v >>> 8) & 0xff).toByte
    b(pos + 2) = ((v >>> 16) & 0xff).toByte
    b(pos + 3) = ((v >>> 24) & 0xff).toByte
  }

  private def putLeShort(b: Array[Byte], pos: Int, v: Int): Unit = {
    b(pos) = (v & 0xff).toByte
    b(pos + 1) = ((v >>> 8) & 0xff).toByte
  }

  private def putAscii(b: Array[Byte], pos: Int, s: String): Unit = {
    var i = 0
    while (i < s.length) { b(pos + i) = s.charAt(i).toByte; i += 1 }
  }

  /** Deterministic PCM16 mono WAV payload for one id. Layout:
    * RIFF(12) · fmt(24) · LIST(8 + pad) · data(8 + 2n). The LIST pad length
    * is id-dependent and even (RIFF chunks are word-aligned), so `data`
    * never sits at a fixed offset across the corpus. */
  def encodeWav(id: Long): Array[Byte] =
    buildWav(id, Array.tabulate(nSamples(id))(i => sampleAt(id, i)))

  /** [[encodeWav]]'s sample stream plus bounded deterministic noise
    * (clamped int16) — a "re-recorded" near-copy for planted near-dup
    * ground truth and fingerprint-robustness tests. */
  def encodeWavNoisy(id: Long, maxDelta: Int): Array[Byte] = {
    require(maxDelta >= 0)
    buildWav(id, Array.tabulate(nSamples(id)) { i =>
      val d = Math.floorMod(id * 2654435761L + i * 40503L + 11L,
        2L * maxDelta + 1L).toInt - maxDelta
      math.max(-32768, math.min(32767, sampleAt(id, i) + d))
    })
  }

  private def buildWav(id: Long, samples: Array[Int]): Array[Byte] = {
    val n = samples.length
    val sampleRate = 16000
    val pad = (4 + 2 * (id % 6)).toInt // even, 4..14 bytes of LIST body
    val dataSize = 2 * n
    val riffSize = 4 + 24 + (8 + pad) + (8 + dataSize)
    val out = new Array[Byte](8 + riffSize)
    var pos = 0
    putAscii(out, pos, "RIFF"); putLeInt(out, pos + 4, riffSize); pos += 8
    putAscii(out, pos, "WAVE"); pos += 4
    putAscii(out, pos, "fmt "); putLeInt(out, pos + 4, 16); pos += 8
    putLeShort(out, pos, 1)                 // audioFormat = PCM
    putLeShort(out, pos + 2, 1)             // channels = mono
    putLeInt(out, pos + 4, sampleRate)
    putLeInt(out, pos + 8, sampleRate * 2)  // byteRate = rate · blockAlign
    putLeShort(out, pos + 12, 2)            // blockAlign = channels · 2
    putLeShort(out, pos + 14, 16)           // bitsPerSample
    pos += 16
    putAscii(out, pos, "LIST"); putLeInt(out, pos + 4, pad); pos += 8
    // LIST body is zero bytes — content never inspected, only skipped
    pos += pad
    putAscii(out, pos, "data"); putLeInt(out, pos + 4, dataSize); pos += 8
    var i = 0
    while (i < n) {
      putLeShort(out, pos + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  private def leInt(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
      ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)

  private def leShort(b: Array[Byte], pos: Int): Int =
    (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8)

  private def fourCC(b: Array[Byte], pos: Int): String =
    new String(b, pos, 4, "US-ASCII")

  /** The RIFF chunk WALK alone: verify the RIFF/WAVE container, walk the
    * chunk list (word-aligned sizes per the spec), parse `fmt ` (PCM16 mono
    * enforced — anything else fails loudly, corrupt media should surface),
    * stop at `data`. Returns (sampleRate, byte offset of the first sample,
    * sample count) — the one parser every audio stage shares ([[decodeWav]]
    * stats, [[graft.functions.AudioFingerprint]] signatures), same
    * one-parser-every-stage rule as [[Multimodal.parsePpmHeader]]. */
  def locateData(id: Long, b: Array[Byte]): (Int, Int, Int) = {
    require(b.length >= 44 && fourCC(b, 0) == "RIFF" && fourCC(b, 8) == "WAVE",
      s"id=$id: not a RIFF/WAVE payload")
    val end = math.min(b.length.toLong, 8L + leInt(b, 4))
    var pos = 12
    var sampleRate = -1
    var fmtSeen = false
    while (pos + 8 <= end) {
      val cid = fourCC(b, pos)
      val csz = leInt(b, pos + 4)
      require(csz >= 0 && pos + 8 + csz <= end, s"id=$id: truncated chunk $cid")
      cid match {
        case "fmt " =>
          require(csz >= 16, s"id=$id: short fmt chunk")
          require(leShort(b, pos + 8) == 1, s"id=$id: not PCM")
          require(leShort(b, pos + 10) == 1, s"id=$id: not mono")
          sampleRate = leInt(b, pos + 12)
          require(leShort(b, pos + 22) == 16, s"id=$id: not 16-bit")
          fmtSeen = true
        case "data" =>
          require(fmtSeen, s"id=$id: data chunk before fmt")
          return (sampleRate, pos + 8, csz / 2)
        case _ => // LIST/INFO/fact/...: skip
      }
      pos += 8 + csz + (csz & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException(s"id=$id: no data chunk")
  }

  /** Sign-extended int16 sample `i` of a located data chunk. */
  @inline def sampleLe16(b: Array[Byte], dataPos: Int, i: Int): Int = {
    val u = leShort(b, dataPos + 2 * i)
    if (u >= 32768) u - 65536 else u
  }

  /** REAL RIFF/WAVE decode: [[locateData]]'s chunk walk, then one pass over
    * the `data` samples for integer stats. */
  def decodeWav(id: Long, b: Array[Byte]): WavStats = {
    val (sampleRate, dataPos, n) = locateData(id, b)
    var sum = 0L; var sabs = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val s = sampleLe16(b, dataPos, i)
      sum += s
      val a = math.abs(s)
      sabs += a
      if (a > peak) peak = a
      i += 1
    }
    WavStats(id, sampleRate, n.toLong, sum, sabs, peak)
  }

  /** Encode stage: id column → (id, payload) WAV rows, per-partition
    * (payloads born on executors, never on the driver). */
  def wavPayloads(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodeWav(id))))
      .toDF("id", "payload")
  }

  /** Decode stage: binary WAV payload → parsed format + sample stats,
    * per-partition over iterator batches. */
  def decodeWavStage(spark: SparkSession, media: DataFrame): Dataset[WavStats] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => decodeWav(id, p) })
  }
}
