package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Video leg of the multimodal plumbing: a payload of CONCATENATED P6
  * frames (the raw Netpbm stream ffmpeg's `-f image2pipe -c ppm` emits — a
  * public container simple enough to walk in pure JVM) with a REAL
  * frame-sampling decoder: every frame HEADER is parsed to learn the frame's
  * byte length, but only every `stride`-th frame's pixel plane is scanned.
  * That skip-by-header walk is the point of frame sampling at corpus scale —
  * the decoder touches O(frames) header bytes and O(frames/stride) pixel
  * planes, never the whole payload.
  *
  * Frame pixels extend the [[Multimodal.encodePpm]] recurrence with a frame
  * term, so a SQL oracle regenerates every sampled frame without binary:
  * `px(d, f, i) = ((d·1103515245 + f·97531 + i·12345 + 42) mod 2147483647)
  * mod 256`. Dims are constant across a video's frames (as in any real
  * stream); the walker still parses each header rather than assuming it.
  */
object Video {

  /** Per-sampled-frame statistics: frame index + dims + channel sums. */
  case class FrameStats(id: Long, frame: Int, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  /** Frames per payload: bounded, id-dependent (2..7). */
  def nFrames(id: Long): Int = (2 + id % 6).toInt

  /** Frame dims — same family as [[Multimodal.encodePpm]]. */
  def dims(id: Long): (Int, Int) = ((8 + id % 9).toInt, (8 + id % 7).toInt)

  /** The pixel recurrence — public so the spec can replay it locally. */
  def pixelAt(id: Long, frame: Int, i: Int): Int =
    (((id * 1103515245L + frame * 97531L + i * 12345L + 42L) % 2147483647L)
      % 256L).toInt

  /** Deterministic concatenated-P6 payload for one id. */
  def encodeVideo(id: Long): Array[Byte] = {
    val (w, h) = dims(id)
    val nf = nFrames(id)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val plane = 3 * w * h
    val out = new Array[Byte](nf * (header.length + plane))
    var pos = 0
    var f = 0
    while (f < nf) {
      System.arraycopy(header, 0, out, pos, header.length)
      pos += header.length
      var i = 0
      while (i < plane) {
        out(pos + i) = pixelAt(id, f, i).toByte
        i += 1
      }
      pos += plane
      f += 1
    }
    out
  }

  // A P6 header walker shared with Multimodal would couple the two formats'
  // failure messages; the ~20 lines are restated here against the same spec.
  private def isWs(c: Byte): Boolean =
    c == ' ' || c == '\n' || c == '\r' || c == '\t'

  /** Parse one P6 header starting at `start`; returns (w, h, pixelOffset).
    * Malformed frames fail loudly (corrupt media should surface).
    * `private[graft]`: [[graft.functions.VideoDHash]] reuses this walk to
    * hash sampled frames in place — one parser, every video stage. */
  private[graft] def parseFrameHeader(id: Long, b: Array[Byte], start: Int): (Int, Int, Int) = {
    require(start + 2 <= b.length && b(start) == 'P' && b(start + 1) == '6',
      s"id=$id: frame at $start is not P6")
    var pos = start + 2
    def nextInt(): Int = {
      while (pos < b.length && (isWs(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      }
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
        s"id=$id: bad frame header at $start")
      var v = 0L
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
        require(v <= (1 << 20), s"id=$id: absurd frame header value $v")
      }
      v.toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"id=$id: 2-byte-maxval frames unsupported")
    // the byte after maxval MUST be the single whitespace separator; a
    // malformed header would otherwise be silently misparsed one byte into
    // the pixel plane instead of failing loudly
    require(pos < b.length && isWs(b(pos)),
      s"id=$id: missing whitespace after maxval at $start")
    pos += 1 // single whitespace byte before the plane
    require(b.length - pos >= 3L * w * h, s"id=$id: truncated frame at $start")
    (w, h, pos)
  }

  /** REAL frame-sample: walk the concatenated stream, parse every header,
    * scan only frames where `frame % stride == 0`. Returns one stats row
    * per sampled frame. */
  def sampleVideo(id: Long, b: Array[Byte], stride: Int): Seq[FrameStats] = {
    require(stride >= 1, s"id=$id: bad stride $stride")
    val out = Seq.newBuilder[FrameStats]
    var pos = 0
    var f = 0
    while (pos < b.length) {
      val (w, h, px) = parseFrameHeader(id, b, pos)
      val plane = 3 * w * h
      if (f % stride == 0) {
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < plane) {
          val v = (b(px + i) & 0xff).toLong
          val c = i % 3
          if (c == 0) sr += v else if (c == 1) sg += v else sb += v
          i += 1
        }
        out += FrameStats(id, f, w, h, sr, sg, sb)
      }
      pos = px + plane // skipped frames cost only their header parse
      f += 1
    }
    require(f > 0, s"id=$id: empty video payload")
    out.result()
  }

  /** Encode stage: id column → (id, payload) video rows, per-partition. */
  def videoPayloads(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodeVideo(id))))
      .toDF("id", "payload")
  }

  /** Frame-sample stage: binary video payload → per-sampled-frame stats,
    * per-partition, one output row per sampled frame. */
  def sampleVideoStage(spark: SparkSession, media: DataFrame,
                       stride: Int): Dataset[FrameStats] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, p) => sampleVideo(id, p, stride) })
  }
}
