package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mean-shift changepoint detection over per-group event-rate series —
  * the "WHEN did this source change" companion to [[Robust.rateSpikes]]'s
  * "which buckets are anomalous": a level shift (deploy, upstream format
  * change, crawler block) moves EVERY bucket after some boundary, which a
  * per-bucket outlier screen dilutes but a changepoint statistic
  * concentrates.
  *
  * Statistic: the classic CUSUM-type split score. With prefix sums S_b
  * over the gap-filled hourly series, score(b) = |n·S_b − b·S_n| equals
  * b·(n−b)·|μ_before − μ_after| EXACTLY (integer identity, no floats) —
  * maximizing it is binary segmentation's first split. The reported
  * boundary is the prefix length b with max score, ties to the earliest
  * hour; before/after means ride along in exact milli-units (counts are
  * ≥ 0, so `div` == floor and the oracle needs no sign split — only the
  * score's abs is computed, not a signed ratio).
  *
  * Gap semantics: missing hours are REAL zero-count buckets — a feed
  * that stops is the loudest level shift there is — so the series is
  * gap-filled from each group's min..max hour before anything sums.
  *
  * Scale shape: one map-side-combined (group, hour) count; the series
  * frame is bounded by groups × timespan-hours, NOT by event count, and
  * every window partitions by group over that bounded frame (the
  * rateSpikes precedent). Groups with a single bucket have no interior
  * boundary and don't appear. Null group/ts rows are excluded.
  */
object Changepoint {

  /** (group, n_buckets, cp_hour, score, mean_before_m, mean_after_m):
    * the best split per group — boundary AFTER epoch-hour `cp_hour`,
    * means in milli-events/bucket. */
  def meanShift(events: DataFrame, groupCol: String, tsCol: String,
                bucketUs: Long = 3600000000L): DataFrame = {
    val counts = events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) div ${bucketUs}L").as("h"))
      .groupBy("grp", "h").agg(count(lit(1)).as("c"))
    val span = counts.groupBy("grp")
      .agg(min("h").as("__h0"), max("h").as("__h1"))
    val series = span
      .select(col("grp"), explode(sequence(col("__h0"), col("__h1"))).as("h"))
      .join(counts, Seq("grp", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wCum = Window.partitionBy("grp").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("grp")
    val scored = series
      .withColumn("__sb", sum("c").over(wCum))
      .withColumn("__b", count(lit(1)).over(wCum))
      .withColumn("__sn", sum("c").over(wAll))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__b") < col("__n"))
      .withColumn("score", abs(col("__n") * col("__sb") -
        col("__b") * col("__sn")))
    val wPick = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("h").asc)
    scored
      .withColumn("__rk", row_number().over(wPick))
      .filter(col("__rk") === 1)
      .select(col("grp"), col("__n").as("n_buckets"),
        col("h").as("cp_hour"), col("score"),
        expr("(1000 * __sb) div __b").as("mean_before_m"),
        expr("(1000 * (__sn - __sb)) div (__n - __b)").as("mean_after_m"))
  }
}
