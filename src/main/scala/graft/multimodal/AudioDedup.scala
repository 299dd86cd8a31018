package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.SimHash
import graft.functions.AudioFingerprint

/** Audio near-duplicate detection: dedup WAVs the way the pipeline dedups
  * text (SimHash) and images (dHash). Composes the real RIFF/WAVE walker
  * ([[Audio.locateData]]), the native Haitsma–Kalker-style fingerprint
  * expression ([[graft.functions.AudioFingerprint]]) and the 4×16-bit
  * Hamming-bucket join
  * ([[graft.dedup.SimHash.nearDuplicatesFromSignatures]]) — hash every
  * payload once (per-row, codegen), bucket-join on hash chunks, never
  * all-pairs.
  *
  * Scale shape is identical to [[ImageDedup]]: fingerprinting is
  * embarrassingly parallel over payload bytes (which never move — only the
  * 8-byte signature shuffles), candidate generation is the linear chunk
  * equi-join. At 100 TB of audio the payload column stays parked in
  * parquet; the entire dedup exchanges ids and longs. This closes the
  * third cell of the modality×dedup matrix (reference has no audio
  * surface — LLM-data-pipeline extension row; cf. the opaque-record shape
  * of Prediction_Pipe_Line.py:94-111).
  */
object AudioDedup {

  /** (id, afp) perceptual fingerprints of a `(id, payload)` media frame —
    * one native-codegen expression per row, zero exchanges. */
  def fingerprints(media: DataFrame): DataFrame =
    media.select(col("id").cast("long").as("id"),
      AudioFingerprint(media.sparkSession, col("payload")).as("afp"))

  /** Near-duplicate audio pairs within Hamming radius `maxHamming` (≤ 3 —
    * the chunk join's completeness bound; empirically a re-recorded copy
    * with bounded per-sample noise lands at radius ≤ 3 for ~97% of
    * payloads while unrelated clips sit ≥ 13 apart — see AudioDedupSpec).
    * Output: (id_a, id_b, hamming), id_a < id_b. */
  def nearDupAudio(media: DataFrame, maxHamming: Int = 3): DataFrame =
    SimHash.nearDuplicatesFromSignatures(
      fingerprints(media).withColumnRenamed("afp", "simhash"), maxHamming)

  /** Incremental audio dedup: today's `(id, payload)` batch against an
    * already-fingerprinted corpus (`indexSigs` = `(id, afp)`, typically
    * read back from parquet — historical payloads never re-decoded), plus
    * within-batch pairs from the ordinary self-join on the increment
    * alone. The audio twin of
    * [[graft.multimodal.ImageDedup.incrementalNearDupImages]]: the
    * increment's chunk rows BROADCAST onto the index scan via
    * [[graft.dedup.SimHash.nearDuplicatesAgainstIndex]], the corpus is
    * probed in place, never shuffled. Output: (new_id, dup_id, hamming);
    * ids must be disjoint across index and batch. */
  def incrementalNearDupAudio(newMedia: DataFrame, indexSigs: DataFrame,
                              maxHamming: Int = 3): DataFrame =
    SimHash.incrementalNearDups(
      indexSigs.withColumnRenamed("afp", "simhash"),
      fingerprints(newMedia).withColumnRenamed("afp", "simhash"), maxHamming)
}
