package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style language-model quality signal: score each document by the
  * conditional cross-entropy of a character-trigram LM trained on the
  * corpus itself (reference pipelines train on a trusted corpus — e.g.
  * Wikipedia — and score the crawl; self-training is the degenerate
  * single-corpus case and keeps the driver oracle closed-form). Documents
  * whose character sequences are atypical for the corpus (mojibake,
  * ransom-note casing, non-prose) score high; fluent prose scores low.
  *
  * All arithmetic after the per-position log is INTEGER: each position
  * contributes floor(-ln(P(c₃|c₁c₂)) · 10⁶) as a long, and the per-doc
  * figure is an integer-division mean — so sums are exact and immune to
  * float summation order across partitions/engines. Residual cross-engine
  * risk: ln() itself is NOT IEEE correctly-rounded, so JVM Math.log and a
  * C libm may differ by 1 ulp — a ratio whose -ln lands within ~1e-10 of
  * an exact micro-nat boundary could floor differently between engines.
  * No (tc, bc) pair at the tested scales sits on such a boundary, but the
  * per-ratio flip probability grows with distinct-ratio count; an
  * engine-portability-first deployment would tolerate ±1 per nll_u in a
  * comparator rather than demand bit equality. Because the model is
  * trained on the corpus being scored, every document trigram is in the
  * model by construction and no smoothing term is needed.
  *
  * Shuffle economics at 100 TB: the trigram explosion never shuffles text
  * — the two count aggregations are map-side combined down to the DISTINCT
  * trigram/bigram sets per partition (bounded by |charset|³, not corpus
  * size), and the model tables broadcast (ASCII charset³ ≲ 10⁶ rows).
  * Scoring is therefore a broadcast-join at the scan plus one partial-agg
  * groupBy(doc) whose input is already one integer per position. To shrink
  * the count-shuffle keys further at scale, hash trigrams to longs first —
  * at the cost of the usual 64-bit collision mode (see
  * [[Boilerplate.removeHotLines]] for the honest statement of that mode).
  */
object LmScore {

  /** All length-`n` character windows of `c`, empty array when the string
    * is shorter than `n` (sequence(1,0) would yield a DESCENDING range —
    * the guard is load-bearing, not cosmetic). */
  def charNgrams(c: Column, n: Int): Column =
    when(length(c) >= n,
      transform(sequence(lit(1), length(c) - (n - 1)), i => c.substr(i, lit(n))))
      .otherwise(array().cast("array<string>"))

  /** Per-document conditional trigram cross-entropy in integer micro-nats:
    * (idCol, n_tri, sum_nll_u, xent_u) where
    * xent_u = (Σ floor(-ln(tc/bc)·10⁶)) div n_tri, tc = corpus count of
    * the trigram, bc = corpus count of its 2-char context (counted as
    * trigram prefixes, so Σ_c₃ tc = bc exactly). Documents shorter than 3
    * chars have no trigrams and drop out. */
  def trigramCrossEntropy(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val tris = graft.Guards.materialize(df
      .select(col(idCol), explode(charNgrams(col(textCol), 3)).as("tg")))
    val triCnt = tris.groupBy("tg").agg(count(lit(1)).as("tc"))
    // contexts counted FROM the trigram table (prefixes), not re-exploded:
    // guarantees Σ tc over a context == bc, i.e. P sums to 1 per context
    val biCnt = tris.groupBy(substring(col("tg"), 1, 2).as("bg"))
      .agg(count(lit(1)).as("bc"))
    tris
      .join(broadcast(triCnt), "tg")
      .join(broadcast(biCnt), substring(col("tg"), 1, 2) === col("bg"))
      .withColumn("nll_u",
        floor(-log(col("tc").cast("double") / col("bc").cast("double")) * 1e6)
          .cast("long"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tri"), sum(col("nll_u")).as("sum_nll_u"))
      .withColumn("xent_u", expr("sum_nll_u div n_tri"))
  }
}
