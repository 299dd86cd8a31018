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

  /** Incremental image dedup: today's ingest against an already-hashed
    * corpus, without reprocessing (or even re-reading) historical images —
    * the image twin of [[graft.dedup.MinHashDedup.incrementalNearDups]]
    * and the q73 embedding ingest. The corpus participates ONLY through
    * its persisted `(id, dhash)` signature table (built by [[dHashes]],
    * written once at corpus build, appended per ingest): cross pairs come
    * from [[graft.dedup.SimHash.nearDuplicatesAgainstIndex]] (the
    * increment's chunk rows broadcast onto the index scan), within-batch
    * pairs from the ordinary self-join on the increment alone.
    *
    * Output: (new_id, dup_id, hamming) — `dup_id` an indexed corpus image
    * or an earlier (lower-id) image of the same increment. Contract: ids
    * are globally unique across corpus and increment. */
  def incrementalNearDupImages(newMedia: DataFrame, indexSigs: DataFrame,
                               maxHamming: Int = 3): DataFrame =
    SimHash.incrementalNearDups(
      indexSigs.withColumnRenamed("dhash", "simhash"),
      dHashes(newMedia).withColumnRenamed("dhash", "simhash"), maxHamming)
}
