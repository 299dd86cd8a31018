package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Token-distribution drift between two corpus slices — the population
  * stability index (PSI), the standard production monitor for "has this
  * source changed under me": per vocabulary token,
  *
  *   psi = (p_a − p_b) · ln(p_a / p_b),   p = (c + 1) / (T + K)
  *
  * with add-one smoothing over the top-`K` union vocabulary (absent
  * tokens stay finite, and the smoothing denominator is the SAME K on
  * both sides, so identical distributions still score exactly 0 per
  * token). Every per-token term is ≥ 0 — difference and log share sign —
  * and the corpus-level PSI is the plain sum of the per-token
  * `psi_u` micro-units: the floors happen per token BEFORE the sum, so
  * the total is order-independent int64 (the row-76/102 exactness rule).
  * The industry reading convention: < 0.1 stable, 0.1–0.25 drifting,
  * > 0.25 shifted — in micro-units, 100 000 and 250 000.
  *
  * Exactness model (the [[Collocations]] precedent): counts and totals
  * are exact int64; p_a, p_b and their quotient are single
  * IEEE-correctly-rounded divisions of exact-in-double integers; the one
  * `ln·10⁶` floor per token carries the documented 1-ulp libm risk
  * (q77/q104/q112's caveat) — a ratio landing within ~1e-10 of a
  * micro-nat boundary could floor differently between engines.
  *
  * Scale shape: two map-side-combined vocabulary-bounded count shuffles
  * (token instances never shuffle as rows — `explode` feeds a partial
  * agg), a vocabulary-sized full-outer merge, a TakeOrdered top-K cut
  * (deterministic (combined desc, token asc) ties), and broadcast
  * single-row totals. Nothing corpus-sized moves. */
object Drift {

  private def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("c"))

  /** (token, c_a, c_b, psi_u) over the top-`topK` union-vocabulary
    * tokens. Corpus PSI = Σ psi_u (exact int64; sum in the caller or a
    * downstream agg — the per-token grain is the actionable report:
    * WHICH tokens moved). */
  def tokenDrift(a: DataFrame, b: DataFrame, textCol: String,
                 topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    // each side's count frame feeds TWO consumers (the vocab merge and
    // its own total) — a diamond Catalyst won't collapse; materialize the
    // vocabulary-bounded frame once (eager localCheckpoint, the
    // Guards.materialize contract: blocks reclaimed by the ContextCleaner
    // on GC or Guards.releaseMaterialized, invisible to clearCache) so
    // the corpus explode+agg pass runs once per side, not twice.
    val ca = graft.Guards.materialize(tokenCounts(a, textCol))
    val cb = graft.Guards.materialize(tokenCounts(b, textCol))
    val merged = ca.select(col("token"), col("c").as("__ca"))
      .join(cb.select(col("token"), col("c").as("__cb")),
        Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("__ca"), lit(0L)).as("c_a"),
        coalesce(col("__cb"), lit(0L)).as("c_b"))
    val vocab = merged
      .orderBy((col("c_a") + col("c_b")).desc, col("token").asc)
      .limit(topK)
    val totA = ca.agg(coalesce(sum("c"), lit(0L)).as("t_a"))
    val totB = cb.agg(coalesce(sum("c"), lit(0L)).as("t_b"))
    vocab
      .crossJoin(broadcast(totA)).crossJoin(broadcast(totB))
      .withColumn("psi_u", expr(
        s"""CAST(FLOOR(
           |((CAST(c_a + 1 AS DOUBLE) / (t_a + $topK))
           | - (CAST(c_b + 1 AS DOUBLE) / (t_b + $topK)))
           |* LN((CAST(c_a + 1 AS DOUBLE) / (t_a + $topK))
           |    / (CAST(c_b + 1 AS DOUBLE) / (t_b + $topK)))
           |* 1000000) AS BIGINT)""".stripMargin.replace("\n", " ")))
      .select("token", "c_a", "c_b", "psi_u")
  }
}
