package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Churn-label construction — the supervised-training staple over an
  * event log: split the observed span at its midpoint day, and for every
  * key active in the FIRST half report its first-half activity features
  * and the label "went silent in the second half". Keys first seen in
  * the second half are excluded (no observation window — including them
  * would leak the label into the features).
  *
  * All integer: days are epoch-µs div day; the split day is
  * (min_day + max_day + 1) div 2 from ONE broadcast single-row span
  * attach, so the windows are a pure function of the data and
  * reproducible anywhere. Activity = events and DISTINCT active days per
  * half (distinct-day collapse first — the Retention shape — bounds the
  * aggregate by keys × days).
  */
object Churn {

  private val DayUs = 86400000000L

  /** (key, events_w1, days_w1, events_w2, days_w2, churned). */
  def labels(events: DataFrame, keyCol: String,
             tsCol: String): DataFrame = {
    val e = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol) div ${DayUs}L").as("__d"))
    val span = e.agg(min("__d").as("__d0"), max("__d").as("__d1"))
    val tagged = e.join(broadcast(span))
      .withColumn("__w2",
        (col("__d") >= expr("(__d0 + __d1 + 1) div 2")).cast("long"))
    tagged.groupBy("key")
      .agg(
        sum(when(col("__w2") === 0L, 1L).otherwise(0L)).as("events_w1"),
        countDistinct(when(col("__w2") === 0L, col("__d"))).as("days_w1"),
        sum(col("__w2")).as("events_w2"),
        countDistinct(when(col("__w2") === 1L, col("__d"))).as("days_w2"))
      .filter(col("events_w1") > 0L)
      .withColumn("churned",
        (col("events_w2") === 0L).cast("long"))
  }
}
