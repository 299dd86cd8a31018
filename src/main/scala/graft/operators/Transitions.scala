package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-type transition matrix — the first-order Markov census of user
  * journeys (click→purchase, error→abandon): for every adjacent pair of a
  * user's events in (ts, id) order, count (from, to) occurrences and each
  * from-type's outgoing share in basis points. The product-analytics
  * companion to the strict-order [[Funnel]] (which checks ONE prescribed
  * path; this measures ALL observed paths) and the input to journey
  * simulation / next-event prediction baselines.
  *
  * Exactness: the successor comes from `lead` over the per-user (ts, id)
  * TOTAL order — deterministic under timestamp ties — and the share is one
  * integer `div` per (from, to) row, so the matrix replays bit-for-bit.
  *
  * Scale shape: the lead window partitions by user — state is one user's
  * events, never the stream (the [[graft.streaming.Sessionize]] argument);
  * the shuffle carries (user, ts, id, type) only; the two count
  * aggregates are map-side combined and bounded by |types|².
  * Null user/ts/type rows are excluded (no identity / no order / no
  * state — the EpochShuffle null contract).
  */
object Transitions {

  /** (from_type, to_type, n, out_bp) over an event frame. */
  def matrix(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("__u").orderBy(col("__t"), col("__id"))
    val pairs = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("__u"),
        expr(s"unix_micros($tsCol)").as("__t"),
        col(idCol).as("__id"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val outTotals = counts.groupBy("from_type").agg(sum("n").as("__tot"))
    counts.join(outTotals, "from_type")
      .withColumn("out_bp", expr("(10000 * n) div __tot"))
      .drop("__tot")
  }
}
