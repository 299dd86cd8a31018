package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic epoch-shuffle ordering: assign every row a reproducible
  * pseudo-random GLOBAL position for a training epoch — the "shuffle the
  * corpus differently each epoch, identically on every rerun" step every
  * LLM data loader needs upstream of sequence packing (loader seeds in
  * the reference's randomSplit sense, Scalable_Project_ML_Model_Analysis
  * .py:172, scaled from one split to a whole training order).
  *
  * The permutation key is a portable two-step MINSTD-style scramble of
  * (id, epoch) over the Mersenne prime 2^31−1 — expressible identically
  * in Spark and the DuckDB oracle with no 64-bit overflow on either
  * engine (the [[Sampling.lcgBp]] portability contract, widened from
  * basis points to a full 31-bit key). Same epoch ⇒ same order on every
  * run, partitioning, and engine; different epochs ⇒ uncorrelated orders.
  *
  * Scale shape: the naive formulation — `row_number() OVER (ORDER BY
  * key)` — is ONE task sorting the corpus. Instead the key space is cut
  * into `nBuckets` contiguous ranges (bucket = key div width, so bucket
  * order IS key order): per-bucket counts roll up to a ≤ nBuckets-row
  * offsets frame (the only unpartitioned window runs over THAT — bounded
  * by config, the [[Packing]] precedent), offsets broadcast back, and
  * each bucket ranks its own rows. position = bucket offset + local rank.
  * Shuffles carry (id, key) longs only; size nBuckets so corpus/nBuckets
  * rows sort per task at the target scale.
  *
  * Null ids are filtered out up front (documented, the
  * [[Robust.groupQuantile]] precedent): a row with no stable identity has
  * no reproducible place in any epoch's order.
  */
object EpochShuffle {

  private val M = 2147483647L // 2^31 − 1 (Mersenne prime; MINSTD modulus)

  /** Portable per-epoch scramble key in [0, M); `id` must be integral.
    * Mirrored literally by the DuckDB oracle: (id + epoch·1000003) % M,
    * then multiply–xorshift–multiply–xorshift (·48271 % M, ^(>>15),
    * ·69621 % M, ^(>>13)) — every product stays under 2^48 and every xor
    * operand under 2^31, safely inside BIGINT on both engines. The
    * xorshift hops are ESSENTIAL, not polish: a purely multiplicative
    * chain is linear mod M, so stepping the epoch would shift every key
    * by one constant — a rotation of the SAME order (the spec's
    * successor-churn test catches exactly this). Xor breaks the
    * linearity; epochs decorrelate. */
  def epochKey(id: Column, epoch: Int): Column = {
    val s0 = pmod(id.cast("long") + lit(epoch.toLong) * lit(1000003L), lit(M))
    val s1 = pmod(s0 * lit(48271L), lit(M))
    val s2 = s1.bitwiseXOR(shiftright(s1, 15))
    val s3 = pmod(s2 * lit(69621L), lit(M))
    s3.bitwiseXOR(shiftright(s3, 13))
  }

  /** (idCol, shuffle_key, pos) — `pos` is the exact 0-based global rank of
    * `shuffle_key` (ties broken by id: key collisions across the 31-bit
    * space are rare but must order deterministically), a permutation of
    * [0, n). Feed `pos` to [[Packing.planPacking]] in place of raw ids for
    * an epoch-shuffled packing order, or range-write by it
    * ([[graft.sources.Tables.writeRangeLayout]]) to lay the epoch
    * out on disk. */
  def epochOrder(df: DataFrame, idCol: String, epoch: Int,
                 nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val width = (M + nBuckets - 1) / nBuckets // ceil: bucket ids < nBuckets
    val keyed = df
      .filter(col(idCol).isNotNull)
      .select(col(idCol), epochKey(col(idCol), epoch).as("shuffle_key"))
      // integer div keeps bucket order == key order (the Packing rule:
      // float division could misplace a boundary key)
      .withColumn("__bucket", expr(s"shuffle_key div ${width}"))
    val counts = keyed.groupBy("__bucket").agg(count(lit(1)).as("__cnt"))
    // ≤ nBuckets rows: the one unpartitioned window, bounded by config
    val offsets = counts
      .withColumn("__off",
        coalesce(sum("__cnt").over(
          Window.orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("__cnt"), lit(0L)))
      .select(col("__bucket"), col("__off"))
    keyed
      .join(broadcast(offsets), "__bucket")
      .withColumn("__local", row_number().over(
        Window.partitionBy("__bucket")
          .orderBy(col("shuffle_key"), col(idCol))))
      .select(col(idCol), col("shuffle_key"),
        (col("__off") + col("__local") - lit(1L)).as("pos"))
  }
}
