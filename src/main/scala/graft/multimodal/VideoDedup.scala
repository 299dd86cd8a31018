package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.SimHash
import graft.functions.VideoDHash

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
}
