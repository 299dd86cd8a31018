package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: left rows with a point timestamp ⋈
  * right rows with [start, end] intervals, matched when the point falls in
  * the interval (and an equi-key agrees).
  *
  * Spark plans a raw `l.ts BETWEEN r.start AND r.end` predicate as a
  * broadcast-nested-loop / cartesian — O(|L|·|R|) and disqualifying at
  * scale. This operator bucketizes time instead: pick a bucket width ≥ the
  * maximum interval length, explode each interval over the (≤ 2) buckets
  * it can touch, bucket the points, and equi-join on (key, bucket) with the
  * exact BETWEEN as a post-filter. The join is a plain hash join whose
  * shuffle is keyed by (key, bucket); candidate volume per point is only
  * the intervals in its own and neighboring bucket.
  *
  * `bucketWidthUs` MUST be ≥ every interval's length (end − start) — an
  * interval longer than one bucket would need to explode over more buckets
  * than the fixed 2 this plan emits. Enforced at runtime with a one-row
  * aggregate check folded into the plan (fails fast, no extra pass).
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame,
                pointKey: String, intervalKey: String,
                pointTs: String, startTs: String, endTs: String,
                bucketWidthUs: Long,
                intervalValueCols: Seq[String]): DataFrame = {
    val clash = points.columns.toSet &
      (intervalValueCols.toSet + startTs + endTs)
    require(clash.isEmpty,
      s"interval columns collide with point columns: $clash — alias them first")
    // integer `div` throughout (codebase rule, see Tables.events): double
    // division loses exactness past 2^53 µs and floor semantics with it
    val p = points
      .withColumn("__b", expr(s"unix_micros($pointTs) div ${bucketWidthUs}L"))
      .withColumn("__k", col(pointKey))
    val i = intervals
      .filter(col(endTs) >= col(startTs)) // degenerate intervals match nothing
      .withColumn("__len",
        unix_micros(col(endTs)) - unix_micros(col(startTs)))
      .withColumn("__check",
        when(col("__len") > bucketWidthUs,
          raise_error(concat(lit("rangeJoin: interval length "), col("__len"),
            lit(s"us exceeds bucket width ${bucketWidthUs}us"))))
          .otherwise(lit(0L)))
      // explode over exactly the buckets the interval touches (1 or 2) —
      // __check rides along so the length guard stays in the plan
      .withColumn("__b", explode(sequence(
        expr(s"unix_micros($startTs) div ${bucketWidthUs}L"),
        expr(s"unix_micros($endTs) div ${bucketWidthUs}L") + col("__check"))))
      .withColumn("__k", col(intervalKey))
    p.join(i.select(Seq("__k", "__b", startTs, endTs).map(col) ++
          intervalValueCols.map(col): _*),
        Seq("__k", "__b"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) <= col(endTs))
      .select(points.columns.map(col) ++ intervalValueCols.map(col): _*)
  }
}
