package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped the way a real pipeline runs them (per-partition batches
  * over a `Dataset`, the Scala analog of `mapInPandas`).
  *
  * The container has no image/audio codecs, so the *decode step is a STUB* —
  * a deterministic fake that derives "pixels" from the payload bytes. The
  * Spark-side contract is real and tested: schema (binary + struct metadata),
  * partition-parallel batch shape, and the invariant that payload bytes never
  * hit the driver. Swap [[fakeDecode]] for a codec call and nothing else
  * changes.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  case class MediaMeta(width: Int, height: Int, format: String, nFrames: Int)

  /** One media row as seen by per-partition stages. */
  case class MediaRow(id: Long, payload: Array[Byte], width: Int, height: Int,
                      format: String, nFrames: Int)

  /** Decoded (stub) representation: a small fixed-length feature of the
    * payload standing in for pixel data. */
  case class Decoded(id: Long, width: Int, height: Int, feature: Array[Double])

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

  /** STUB decode: ??? in a real deployment this calls an image codec on
    * `payload`; here it derives a deterministic 8-dim "feature" from byte
    * content. Runs per-partition over iterator batches — the distributed
    * shape of a real decoder — and never collects payloads to the driver. */
  def fakeDecode(rows: Iterator[MediaRow]): Iterator[Decoded] =
    rows.map { r =>
      val feature = new Array[Double](8)
      var i = 0
      while (i < r.payload.length) {
        feature(i % 8) += (r.payload(i) & 0xff).toDouble / 255.0
        i += 1
      }
      Decoded(r.id, r.width, r.height, feature)
    }

  /** Decode stage: binary payload → per-row feature vector, per-partition. */
  def decode(spark: SparkSession, media: DataFrame): Dataset[Decoded] = {
    import spark.implicits._
    media.select("id", "payload", "width", "height", "format", "nFrames")
      .as[MediaRow].mapPartitions(fakeDecode)
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
