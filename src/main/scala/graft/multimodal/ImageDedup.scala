package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.SimHash
import graft.functions.ImageDHash

/** Cross-modal near-duplicate detection: dedup IMAGES the way the text
  * pipeline dedups documents. Composes three pieces that already exist —
  * the real P6 decoder ([[Multimodal.parsePpmHeader]]), the native
  * perceptual-hash expression ([[graft.functions.ImageDHash]]) and the
  * 4×16-bit Hamming-bucket join
  * ([[graft.dedup.SimHash.nearDuplicatesFromSignatures]]) — into the
  * standard image-dedup shape: hash every payload once (per-row, codegen,
  * O(grid) pixels touched), bucket-join on hash chunks, never all-pairs.
  *
  * Scale shape is identical to text SimHash: signature construction is
  * embarrassingly parallel over payload bytes (which never move — only the
  * 8-byte hash shuffles), and candidate generation is the linear chunk
  * equi-join. At 100 TB of images the payload column stays parked in
  * parquet; the entire dedup exchanges ids and longs.
  */
object ImageDedup {

  /** (id, dhash) perceptual signatures of a `(id, payload)` media frame —
    * one native-codegen expression per row, zero exchanges. */
  def dHashes(media: DataFrame): DataFrame =
    media.select(col("id").cast("long").as("id"),
      ImageDHash(media.sparkSession, col("payload")).as("dhash"))

  /** Near-duplicate image pairs within Hamming radius `maxHamming` (≤ 3 —
    * the chunk join's completeness bound; perceptually, radius ≤ 3 on
    * dHash64 is the usual "same image, re-encoded/brightness-shifted"
    * band). Output: (id_a, id_b, hamming), id_a < id_b. */
  def nearDupImages(media: DataFrame, maxHamming: Int = 3): DataFrame =
    SimHash.nearDuplicatesFromSignatures(
      dHashes(media).withColumnRenamed("dhash", "simhash"), maxHamming)
}
