package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-decayed activity scoring — per key, the sum of event values
  * weighted by a half-life decay of their age: the standard
  * recommendation/ranking freshness signal, and the curation read for
  * "how alive is this source/user right now" where a plain sum counts
  * five-year-old activity at par.
  *
  * The decay is BUCKETED exponential on purpose: weight = 10⁶ >> buckets
  * with buckets = age div halfLifeUs (capped at 62) — the weight exactly
  * halves per whole half-life and is an integer SHIFT, not a float
  * `exp`/`pow` whose last-ulp freedom would make cross-engine hashes
  * diverge (the q77 caveat made unnecessary instead of documented).
  * Values ride as HALF_UP cents (the §5 money rule); every per-event
  * weighted term is int64 (cents·10⁶ ≤ 5·10¹³ here) and the per-key sum
  * is order-independent.
  *
  * "Now" is the corpus max timestamp — a one-row aggregate attached by
  * broadcast (the single-row stats-attach shape), so scores are a pure
  * function of the data, reproducible across runs.
  *
  * Scale shape: one single-row attach + one map-side-combined groupBy on
  * the key; (key, two longs) through the shuffle. Null key/ts/value rows
  * are excluded.
  */
object Decay {

  /** (key, n_events, decayed_uc) — decayed_uc in micro-cents: Σ cents ·
    * (10⁶ >> min(age div halfLifeUs, 62)). */
  def decayedScore(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String,
                   halfLifeUs: Long = 86400000000L): DataFrame = {
    val e = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol)").as("__t"),
        expr(s"cast(round($valueCol * 100) as bigint)").as("__cents"))
    val now = e.agg(max("__t").as("__now"))
    e.join(broadcast(now))
      .withColumn("__b",
        least(expr(s"(__now - __t) div ${halfLifeUs}L"), lit(62L)))
      .withColumn("__w", expr("shiftright(1000000L, cast(__b as int))"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum(expr("__cents * __w")).as("decayed_uc"))
  }
}
