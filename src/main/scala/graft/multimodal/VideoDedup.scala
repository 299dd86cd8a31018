package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.SimHash
import graft.functions.{VideoDHash, VideoFrameDHashes}

/** Video near-duplicate detection: dedup clips the way the pipeline dedups
  * text (SimHash), images (dHash) and audio (audio_fp). Composes the
  * skip-by-header frame walk, the native majority-vote signature
  * ([[graft.functions.VideoDHash]] — per-frame [[graft.functions.ImageDHash]]
  * folded by per-bit majority over sampled frames) and the 4×16-bit
  * Hamming-bucket join
  * ([[graft.dedup.SimHash.nearDuplicatesFromSignatures]]).
  *
  * Scale shape is identical to [[ImageDedup]]/[[AudioDedup]]: signature
  * construction is embarrassingly parallel over payload bytes (which never
  * move — only the 8-byte signature shuffles; per clip only every
  * `stride`-th frame's O(9·8) sampled pixels are read), and candidate
  * generation is the linear chunk equi-join. This closes the fourth and
  * final cell of the modality×dedup matrix (reference has no video
  * surface — LLM-data-pipeline extension row).
  */
object VideoDedup {

  /** (id, vhash) perceptual signatures of a `(id, payload)` media frame —
    * one native-codegen expression per row, zero exchanges. */
  def signatures(media: DataFrame, stride: Int = 2): DataFrame =
    media.select(col("id").cast("long").as("id"),
      VideoDHash(media.sparkSession, col("payload"), stride).as("vhash"))

  /** Near-duplicate clip pairs within Hamming radius `maxHamming` (≤ 3 —
    * the chunk join's completeness bound; a re-encoded clip with identical
    * frames lands at Hamming 0, and per-frame perturbations move the
    * signature only where they flip a bit's majority). Output:
    * (id_a, id_b, hamming), id_a < id_b. */
  def nearDupVideos(media: DataFrame, stride: Int = 2,
                    maxHamming: Int = 3): DataFrame =
    SimHash.nearDuplicatesFromSignatures(
      signatures(media, stride).withColumnRenamed("vhash", "simhash"),
      maxHamming)

  /** (id, frame, dhash) per-sampled-frame signatures — the un-folded
    * stream behind [[signatures]], one `posexplode` over the native
    * [[graft.functions.VideoFrameDHashes]] array. */
  def frameSignatures(media: DataFrame, stride: Int = 2): DataFrame =
    media.select(col("id").cast("long").as("id"),
      posexplode(VideoFrameDHashes(media.sparkSession, col("payload"), stride)))
      .select(col("id"), (col("pos") * stride).as("frame"),
        col("col").as("dhash"))

  /** Cross-modal screen: which clips contain a frame perceptually
    * matching a known still image (blocklist screening, provenance
    * tracing). Join strategy is sized to the asymmetry of the real
    * workload — the clip corpus is the 100 TB side, the image signature
    * table the curated list — so the IMAGE chunk rows BROADCAST onto the
    * frame-signature scan; clip payloads never shuffle, only (id, frame,
    * hash) rows. Same radius-≤3 pigeonhole completeness as every Hamming
    * join here. Output: (clip_id, frame, image_id, hamming). */
  def framesMatchingImages(videoMedia: DataFrame, imageSigs: DataFrame,
                           stride: Int = 2, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit chunk LSH is only complete for maxHamming <= 3, got $maxHamming")
    val fr = SimHash.chunk16(
      frameSignatures(videoMedia, stride).withColumnRenamed("dhash", "simhash"),
      carry = Seq("frame")).as("v")
    val im = SimHash.chunk16(
      imageSigs.withColumnRenamed("dhash", "simhash")).as("i")
    fr.join(broadcast(im),
        col("v.band") === col("i.band") && col("v.chunk") === col("i.chunk"))
      .select(col("v.id").as("clip_id"), col("v.frame").as("frame"),
        col("i.id").as("image_id"),
        SimHash.hamming(col("v.simhash"), col("i.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Incremental video dedup: today's `(id, payload)` clips against an
    * already-signed corpus (`indexSigs` = `(id, vhash)`, typically read
    * back from parquet — historical clips never re-decoded), plus
    * within-batch pairs from the self-join on the increment alone. The
    * video twin of [[graft.multimodal.ImageDedup.incrementalNearDupImages]]
    * / [[graft.multimodal.AudioDedup.incrementalNearDupAudio]] — the same
    * broadcast probe of [[graft.dedup.SimHash.nearDuplicatesAgainstIndex]].
    * `stride` must match the index build. Output: (new_id, dup_id,
    * hamming); ids must be disjoint across index and batch. */
  def incrementalNearDupVideos(newMedia: DataFrame, indexSigs: DataFrame,
                               stride: Int = 2,
                               maxHamming: Int = 3): DataFrame =
    SimHash.incrementalNearDups(
      indexSigs.withColumnRenamed("vhash", "simhash"),
      signatures(newMedia, stride).withColumnRenamed("vhash", "simhash"),
      maxHamming)
}
