package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** 64-bit SimHash near-duplicate detection (Charikar '02, the scheme Google
  * described in Manku et al. WWW'07).
  *
  * The whole signature is computed *per row* with Catalyst higher-order
  * functions — zero shuffles for signature construction, which is the right
  * shape at 100 TB (the only exchanges are the small band-bucket self-join
  * for candidate generation). Per-bit token-hash votes are summed with
  * `aggregate`; the 64-bit fingerprint is folded together with bitwise OR.
  *
  * Candidate generation uses the standard Hamming-space trick: split the
  * 64-bit fingerprint into 4 × 16-bit chunks; any pair within Hamming
  * distance ≤ 3 must agree on at least one chunk, so an equi-join on
  * (chunk-index, chunk-value) finds all of them without an all-pairs scan.
  */
object SimHash {

  /** 64-bit simhash of a token array, as a LongType column. */
  def simhash64(tokens: Column): Column = {
    // vote(b) = Σ_tokens (bit b of xxhash64(token) == 1 ? +1 : -1)
    val votes = transform(sequence(lit(0), lit(63)), b =>
      aggregate(tokens, lit(0), (acc, t) =>
        acc + when(call_function("shiftright", xxhash64(t), b)
          .bitwiseAND(lit(1L)) === lit(1L), lit(1)).otherwise(lit(-1))))
    // fingerprint = OR over b of (vote(b) > 0 ? 1L << b : 0L)
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, b) =>
        when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** (id, simhash) signatures for a text column. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      simhash64(TextFunctions.tokens(col(textCol))).as("simhash"))

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming. Bucketed by
    * 16-bit chunks — guaranteed complete for maxHamming ≤ 3 (pigeonhole over
    * 4 chunks), never all-pairs. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val sig = signatures(docs, idCol, textCol)
    val chunked = sig.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
    chunked.as("l").join(chunked.as("r"),
        col("l.band") === col("r.band") &&
          col("l.chunk") === col("r.chunk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming(col("l.simhash"), col("r.simhash")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
