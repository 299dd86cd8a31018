package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LSH banding planner — chooses (bands b, rows-per-band r), b·r = H, for
  * a MinHash signature of H hashes targeting near-dup threshold t. The
  * standard S-curve analysis (Leskovec/Rajaraman/Ullman, *Mining of
  * Massive Datasets* ch. 3): a pair with Jaccard s becomes a candidate
  * with probability P(s) = 1 − (1 − s^r)^b, so each (b, r) trades false
  * positives (candidate mass below t — wasted verification work) against
  * false negatives (missed mass above t — real duplicates never
  * verified). This operator scores every divisor split and flags the
  * cost-minimal one — the config review that otherwise happens by
  * folklore before every large dedup run.
  *
  * EXACT integer fixed point, the rows-76/102 discipline: similarity is
  * swept over the `gridStep`-spaced basis-point midpoints (50, 150, …,
  * 9950 at the default), s^r and (1−s^r)^b are computed by repeated
  * `x·s div 10⁴` multiplies — floor at EVERY step, so the fold is
  * deterministic and an engine oracle replays it multiply-for-multiply —
  * and fp/fn masses are int64 sums of those fixed-point probabilities.
  * No libm, no pow(), no float anywhere: unlike a double S-curve the
  * plan hash-matches across engines bit-for-bit.
  *
  * Scale: the frame is divisors(H) × grid rows (~500 at H = 16) — this
  * is a PLANNING operator for [[MinHashDedup]]'s banding, costing
  * nothing at any corpus size; the single-row min-cost attach rides the
  * broadcast crossJoin precedent (q112-style totals attach).
  */
object LshPlan {

  /** One row per divisor split (b, r) of `numHashes`: candidate-mass
    * false positives below / false negatives above `thresholdBp` (both
    * in summed basis points over the grid), cost_u = fp_u + fn_u, and
    * best = 1 on the cost-minimal row (ties → smaller r, cheaper
    * verification batches). `gridStep` must divide 10⁴ and differ from
    * the threshold's offset so no midpoint sits exactly at t. */
  def bandPlan(spark: SparkSession, numHashes: Int, thresholdBp: Int,
               gridStep: Int = 100): DataFrame = {
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    require(thresholdBp >= 1 && thresholdBp <= 9999,
      s"thresholdBp must be in [1, 9999], got $thresholdBp")
    require(gridStep >= 2 && 10000 % gridStep == 0,
      s"gridStep must divide 10000, got $gridStep")
    import spark.implicits._
    val splits = (1 to numHashes).filter(numHashes % _ == 0)
      .map(r => (numHashes / r, r)).toDF("b", "r")
    val grid = spark.range(10000L / gridStep)
      .select((col("id") * gridStep + gridStep / 2).as("s_bp"))
    // fixed-point s^r: CASE guards r = 1 (Spark's sequence(1, 0) would
    // DESCEND, not empty out like an oracle's generate_series)
    def powFix(base: String, exp: String): String =
      s"CASE WHEN $exp = 1 THEN CAST($base AS BIGINT) ELSE " +
        s"aggregate(sequence(1, $exp - 1), CAST($base AS BIGINT), " +
        s"(acc, z) -> (acc * $base) div 10000) END"
    val scored = splits.crossJoin(grid)
      .withColumn("s_r", expr(powFix("s_bp", "r")))
      .withColumn("q_bp", lit(10000L) - col("s_r"))
      .withColumn("p_cand", lit(10000L) - expr(powFix("q_bp", "b")))
      .groupBy("b", "r")
      .agg(
        sum(when(col("s_bp") < thresholdBp, col("p_cand"))
          .otherwise(0L)).as("fp_u"),
        sum(when(col("s_bp") > thresholdBp, lit(10000L) - col("p_cand"))
          .otherwise(0L)).as("fn_u"))
      .withColumn("cost_u", col("fp_u") + col("fn_u"))
    val best = scored
      .agg(min(struct(col("cost_u"), col("r"))).as("m"))
      .select(col("m.cost_u").as("__bc"), col("m.r").as("__br"))
    scored.crossJoin(broadcast(best))
      .withColumn("best",
        when(col("cost_u") === col("__bc") && col("r") === col("__br"), 1L)
          .otherwise(0L))
      .select("b", "r", "fp_u", "fn_u", "cost_u", "best")
  }
}
