package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum ordering — the stage-major training order curriculum
  * learning uses (Bengio et al. 2009): documents are consumed stage by
  * stage (easiest/highest-quality first), SHUFFLED within each stage —
  * deterministic per epoch, so every rerun and every engine produces the
  * identical order. This is [[EpochShuffle]] generalized by a leading
  * stage key: the output `pos` is the exact 0-based global rank of
  * (stage asc, shuffle_key asc, id asc).
  *
  * Shape: feed any integer stage — quality deciles
  * ([[Sampling.scoreNtile]] buckets), curriculum phase ids, difficulty
  * bands — and hand `pos` to [[Packing.planPacking]] or a range-layout
  * write exactly as with the plain epoch order.
  *
  * Scale shape, the [[EpochShuffle]] rule extended: a global
  * `row_number() OVER (ORDER BY stage, key)` would sort the corpus in
  * one task. Instead the key space splits into `nBuckets` contiguous
  * ranges per stage; per-(stage, bucket) counts roll up to a
  * ≤ stages·nBuckets-row offsets frame (the only unpartitioned window
  * runs over THAT — bounded by configuration, never the corpus),
  * offsets broadcast back, and each (stage, bucket) cell ranks only its
  * own rows. Shuffles carry (id, stage, key) scalars; nothing
  * corpus-wide ever sorts in one place. Null ids or stages are filtered
  * up front (no reproducible place in the order — the [[EpochShuffle]]
  * null contract). */
object Curriculum {

  private val M = 2147483647L // 2^31 − 1, the EpochShuffle.epochKey modulus

  /** (idCol, stage, shuffle_key, pos): `pos` is the exact global rank of
    * (stage, shuffle_key, id) — stages consumed in ascending order, a
    * fresh deterministic shuffle inside each stage per `epoch`. */
  def curriculumOrder(df: DataFrame, idCol: String, stageCol: String,
                      epoch: Int, nBuckets: Int = 256): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val width = (M + nBuckets - 1) / nBuckets
    val keyed = df
      .filter(col(idCol).isNotNull && col(stageCol).isNotNull)
      .select(col(idCol), col(stageCol).cast("int").as("stage"),
        EpochShuffle.epochKey(col(idCol), epoch).as("shuffle_key"))
      .withColumn("__bucket", expr(s"shuffle_key div $width"))
    val counts = keyed.groupBy("stage", "__bucket")
      .agg(count(lit(1)).as("__cnt"))
    // ≤ stages·nBuckets rows: the one unpartitioned window, config-bounded
    val offsets = counts
      .withColumn("__off",
        coalesce(sum("__cnt").over(
          Window.orderBy("stage", "__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("__cnt"), lit(0L)))
      .select(col("stage"), col("__bucket"), col("__off"))
    keyed
      .join(broadcast(offsets), Seq("stage", "__bucket"))
      .withColumn("__local", row_number().over(
        Window.partitionBy("stage", "__bucket")
          .orderBy(col("shuffle_key"), col(idCol))))
      .select(col(idCol), col("stage"), col("shuffle_key"),
        (col("__off") + col("__local") - lit(1L)).as("pos"))
  }
}
