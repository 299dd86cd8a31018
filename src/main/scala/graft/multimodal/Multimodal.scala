package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped the way a real pipeline runs them (per-partition batches
  * over a `Dataset`, the Scala analog of `mapInPandas`).
  *
  * The decode stage is REAL: payloads are Netpbm P6 (PPM) images — a public
  * binary format simple enough to parse in pure JVM with no codec deps —
  * and [[decodePpm]] parses the header (magic, whitespace/comments, dims,
  * maxval) and scans the pixel plane for per-channel statistics. Swapping in
  * a JPEG codec changes one function body; the Spark-side contract —
  * binary column in, per-partition iterator decode, typed stats out, payload
  * bytes never on the driver — is identical.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(width: Int, height: Int, format: String, nFrames: Int)

  /** One media row as seen by per-partition stages. */
  case class MediaRow(id: Long, payload: Array[Byte], width: Int, height: Int,
                      format: String, nFrames: Int)

  /** Byte-histogram feature of an opaque payload (format-agnostic — works
    * on any binary column, decoded or not). */
  case class Featured(id: Long, width: Int, height: Int, feature: Array[Double])

  /** Decoded P6 image statistics: parsed dims + per-channel pixel sums. */
  case class PpmStats(id: Long, width: Int, height: Int, maxval: Int,
                      sum_r: Long, sum_g: Long, sum_b: Long, px_bytes: Long)

  /** Nearest-neighbor thumbnail statistics: source dims + per-channel sums
    * over the tw×th sampled pixels. */
  case class ThumbStats(id: Long, width: Int, height: Int, tw: Int, th: Int,
                        t_sum_r: Long, t_sum_g: Long, t_sum_b: Long)

  /** Attach an opaque binary payload + deterministic fake metadata to a text
    * table (documents stand in for a media corpus). Pure per-row expressions. */
  def withPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col("*"),
      col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("payload"),
      (pmod(xxhash64(col(textCol)), lit(512L)) + 128).cast("int").as("width"),
      (pmod(xxhash64(col(textCol), lit(1)), lit(512L)) + 128).cast("int").as("height"),
      element_at(array(lit("jpeg"), lit("png"), lit("webm")),
        (pmod(xxhash64(col(textCol), lit(2)), lit(3L)) + 1).cast("int")).as("format"),
      (pmod(xxhash64(col(textCol), lit(3)), lit(64L)) + 1).cast("int").as("nFrames"))

  // ---------------------------------------------------------------------
  // Real P6 (PPM) encode/decode — pure JVM, no codec dependencies
  // ---------------------------------------------------------------------

  /** Deterministic P6 payload for one id: dims derived from the id, pixel
    * bytes from a positional-hash recurrence — chosen so a SQL oracle can
    * regenerate every byte without parsing binary:
    * `px(d, i) = ((d·1103515245 + i·12345 + 42) mod 2147483647) mod 256`.
    * All intermediates stay well inside int64 at any realistic id range. */
  def encodePpm(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val n = 3 * w * h
    val out = new Array[Byte](header.length + n)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < n) {
      out(header.length + i) =
        (((id * 1103515245L + i * 12345L + 42L) % 2147483647L) % 256L).toByte
      i += 1
    }
    out
  }

  /** REAL Netpbm P6 header parse: magic, whitespace/comment-tolerant
    * header tokens (width, height, maxval per the published spec), the
    * single whitespace byte. Returns (w, h, maxval, pixelOffset); the RGB
    * plane is validated to be fully present. Malformed payloads fail
    * loudly (corrupt media should surface, not silently zero). */
  private[graft] def parsePpmHeader(id: Long, b: Array[Byte]): (Int, Int, Int, Int) = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', s"id=$id: not a P6 PPM")
    var pos = 2
    def isWs(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def nextInt(): Int = {
      while (pos < b.length && (isWs(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') { // comment runs to end of line
          while (pos < b.length && b(pos) != '\n') pos += 1
        } else pos += 1
      }
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9',
        s"id=$id: bad PPM header")
      var v = 0L
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1
        // bound BEFORE the next digit: a malformed header must fail loud,
        // not wrap Int and sneak past the truncation check as a negative n
        require(v <= (1 << 20), s"id=$id: absurd PPM header value $v")
      }
      v.toInt
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    // same loud-failure contract as the Video frame walker: the byte after
    // maxval must BE whitespace, or the parse is off-by-one into the plane
    require(pos < b.length && isWs(b(pos)),
      s"id=$id: missing whitespace after maxval")
    pos += 1 // exactly one whitespace byte separates maxval from pixels
    val n = 3L * w * h
    require(n <= Int.MaxValue && b.length - pos >= n,
      s"id=$id: truncated pixel data")
    (w, h, maxval, pos)
  }

  /** Decode: parse the header, then one pass over the RGB plane for
    * per-channel sums. */
  def decodePpm(id: Long, b: Array[Byte]): PpmStats = {
    val (w, h, maxval, pos) = parsePpmHeader(id, b)
    val n = 3 * w * h
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < n) {
      val v = (b(pos + i) & 0xff).toLong
      val c = i % 3
      if (c == 0) sr += v else if (c == 1) sg += v else sb += v
      i += 1
    }
    PpmStats(id, w, h, maxval, sr, sg, sb, n.toLong)
  }

  /** REAL nearest-neighbor resize: decode, sample the tw×th grid
    * (source pixel (ty·h div th, tx·w div tw) for thumbnail cell
    * (tx, ty) — the standard nearest-neighbor index map), emit per-channel
    * sums over the sampled pixels. Work is O(tw·th) per image AFTER the
    * O(1) header parse — a resize never touches the full plane, which is
    * the point of sampling-based thumbnails at corpus scale. */
  def resizePpm(id: Long, b: Array[Byte], tw: Int, th: Int): ThumbStats = {
    require(tw >= 1 && th >= 1, s"id=$id: bad thumb dims ${tw}x$th")
    val (w, h, _, pos) = parsePpmHeader(id, b)
    var sr = 0L; var sg = 0L; var sb = 0L
    var ty = 0
    while (ty < th) {
      // Long intermediates: header-legal dims reach 2^20, so ty·h can
      // overflow Int for large upsampling targets (negative index)
      val sy = (ty.toLong * h / th).toInt
      var tx = 0
      while (tx < tw) {
        val sx = (tx.toLong * w / tw).toInt
        val base = pos + 3 * (sy * w + sx)
        sr += (b(base) & 0xff).toLong
        sg += (b(base + 1) & 0xff).toLong
        sb += (b(base + 2) & 0xff).toLong
        tx += 1
      }
      ty += 1
    }
    ThumbStats(id, w, h, tw, th, sr, sg, sb)
  }

  /** Encode stage: id column → (id, payload) P6 rows, per-partition (the
    * ingest half of the decode contract; payloads are born on executors
    * and never visit the driver). */
  def ppmPayloads(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long]
      .mapPartitions(_.map(id => (id, encodePpm(id))))
      .toDF("id", "payload")
  }

  /** Decode stage: binary P6 payload → parsed dims + channel stats,
    * per-partition over iterator batches — the distributed shape of a real
    * decoder. */
  def decodePpmStage(spark: SparkSession, media: DataFrame): Dataset[PpmStats] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => decodePpm(id, p) })
  }

  /** Resize stage: binary P6 payload → nearest-neighbor thumbnail channel
    * sums, per-partition — the real-pixel half of [[resize]]'s metadata
    * transform. */
  def resizePpmStage(spark: SparkSession, media: DataFrame,
                     tw: Int, th: Int): Dataset[ThumbStats] = {
    import spark.implicits._
    media.select(col("id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => resizePpm(id, p, tw, th) })
  }

  /** Feature-extract stage: byte-histogram 8-dim feature of any opaque
    * payload. Format-agnostic by design (runs on encoded bytes — the cheap
    * pre-decode signal a curation pass uses to cluster/dedupe payloads
    * before paying for a real decode). */
  def extractFeatures(rows: Iterator[MediaRow]): Iterator[Featured] =
    rows.map { r =>
      val feature = new Array[Double](8)
      var i = 0
      while (i < r.payload.length) {
        feature(i % 8) += (r.payload(i) & 0xff).toDouble / 255.0
        i += 1
      }
      Featured(r.id, r.width, r.height, feature)
    }

  /** Feature stage: payload → per-row feature vector, per-partition. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[Featured] = {
    import spark.implicits._
    media.select("id", "payload", "width", "height", "format", "nFrames")
      .as[MediaRow].mapPartitions(extractFeatures)
  }

  /** Resize stub: metadata transform only (a real resize rewrites payload;
    * the plumbing — new dims, payload passthrough — is what's exercised). */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim).cast("double") / greatest(col("width"), col("height")))
    media
      .withColumn("width", floor(col("width") * scale).cast("int"))
      .withColumn("height", floor(col("height") * scale).cast("int"))
  }

  /** Frame-sample stub: pick every `stride`-th frame index from a video row.
    * Payload-agnostic (indices only), per-row expression. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("sampled_frames",
      sequence(lit(0), col("nFrames") - 1, lit(stride)))

  /** Byte-level metadata summary per source — the kind of scan-side audit a
    * multimodal ingest runs; pure agg, oracle-checkable. */
  def byteStats(media: DataFrame, groupCol: String): DataFrame =
    media.groupBy(groupCol).agg(
      count(lit(1)).as("n_rows"),
      sum(octet_length(col("payload"))).as("total_bytes"),
      min(octet_length(col("payload"))).as("min_bytes"),
      max(octet_length(col("payload"))).as("max_bytes"))
}
