package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RFM segmentation — the recency/frequency/monetary customer table every
  * warehouse ships (Hughes' classic scheme): per user, days since last
  * activity, event count, and spend, each scored into exact quintiles and
  * fused as rfm = 100·R + 10·F + M (555 = best). The
  * campaign-targeting / churn-feature staple, built entirely from exact
  * integer machinery:
  *
  *  - quintiles come from [[Robust.cumeDistBp]] on a constant group —
  *    q = ((pct_bp − 1) div 2000) + 1, so ties share a bucket and both
  *    engines agree bit-for-bit (float percent_rank can't promise that);
  *  - R inverts (6 − q): recent = low recency = low percentile = high
  *    score, the standard orientation;
  *  - "now" is the corpus max activity day — one broadcast single-row
  *    attach (the q197 precedent), never wall-clock (runs must be
  *    reproducible);
  *  - monetary quantizes to whole dollars BEFORE ranking (documented):
  *    cent-resolution sums are near-unique per user, and the ranking
  *    frame must stay value-bounded — dollar bands keep the cume frame
  *    small at any user count while changing no one's quintile in
  *    practice (cent ties across users are what the banding merges).
  */
object Rfm {

  /** (user_id, recency_days, freq, monetary_c, r_score, f_score,
    * m_score, rfm) per user. */
  def segment(events: DataFrame, userCol: String, tsCol: String,
              valueCol: String): DataFrame = {
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user_id"),
        expr(s"unix_micros($tsCol) div 86400000000L").as("__day"),
        expr(s"coalesce(cast(round($valueCol * 100) as bigint), 0L)")
          .as("__cents"))
    val per = e.groupBy("user_id")
      .agg(max("__day").as("__last"), count(lit(1)).as("freq"),
        sum("__cents").as("monetary_c"))
    val now = per.agg(max("__last").as("__now"))
    val base = per.join(broadcast(now))
      .withColumn("recency_days", col("__now") - col("__last"))
      .withColumn("__g", lit(1))
      .withColumn("__mband", expr("monetary_c div 100"))
      .drop("__last", "__now")
    def quint(df: DataFrame, c: String, out: String): DataFrame =
      Robust.cumeDistBp(df, "__g", c)
        .withColumn(out, expr("((pct_bp - 1) div 2000) + 1"))
        .drop("pct_bp")
    val scored = quint(quint(quint(base,
        "recency_days", "__rq"), "freq", "f_score"), "__mband", "m_score")
      .withColumn("r_score", lit(6L) - col("__rq"))
      .drop("__rq", "__g", "__mband")
    scored
      .withColumn("rfm",
        expr("100 * r_score + 10 * f_score + m_score"))
      .select("user_id", "recency_days", "freq", "monetary_c",
        "r_score", "f_score", "m_score", "rfm")
  }
}
