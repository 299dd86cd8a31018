package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group trend estimation — the exact least-squares slope of value
  * over time for every group in one aggregation pass: the drift/decline
  * read behind "is this source's volume/quality trending down" retraining
  * and curation decisions, and the cheap screening regression run before
  * anything model-based. slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over
  * x = epoch time bucket, y = cents.
  *
  * Exactness: x and y are integers (epoch-µs div bucketUs; HALF_UP cents
  * — the §5 money rule), the four sufficient statistics are exact int64
  * sums (headroom: |x| ≤ 5·10⁵ hourly buckets this side of 2030 and
  * |y| ≤ 10⁷ cents keep every per-row term ≤ 2⁶³ at ≤ 10⁸ rows/group;
  * Spark's ANSI sum fails loud beyond), and the final products run in
  * decimal(38,0) before ONE integral `div` scaled by 10⁶ — truncation
  * toward zero, which the oracle mirrors with a sign split since slopes
  * are legitimately negative. Groups with a single distinct bucket have
  * a zero denominator and report NULL slope (no trend is defined).
  *
  * Scale shape: one map-side-combined groupBy carrying five longs per
  * group — the classic sufficient-statistics reduction; no window, no
  * sort, no second pass. Null key/ts/value rows are excluded.
  */
object Trend {

  /** (key, n_events, slope_uc) — slope in micro-cents per bucket:
    * (10⁶·(n·Σxy − Σx·Σy)) div (n·Σx² − (Σx)²), NULL when undefined. */
  def groupTrend(events: DataFrame, keyCol: String, tsCol: String,
                 valueCol: String,
                 bucketUs: Long = 3600000000L): DataFrame = {
    val e = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol) div ${bucketUs}L").as("__x"),
        expr(s"cast(round($valueCol * 100) as bigint)").as("__y"))
    e.groupBy("key")
      .agg(count(lit(1)).as("n_events"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(expr("__x * __y")).as("__sxy"),
        sum(expr("__x * __x")).as("__sxx"))
      .withColumn("__num", expr(
        "cast(n_events as decimal(38,0)) * __sxy - " +
          "cast(__sx as decimal(38,0)) * __sy"))
      .withColumn("__den", expr(
        "cast(n_events as decimal(38,0)) * __sxx - " +
          "cast(__sx as decimal(38,0)) * __sx"))
      .withColumn("slope_uc",
        when(col("__den") =!= 0,
          expr("(1000000 * __num) div __den")).cast("long"))
      .select("key", "n_events", "slope_uc")
  }

  /** Per-group covariance of two INTEGER columns in exact milli-units —
    * the co-movement read ("does spend move with hour", "does length
    * move with quality") run before any modeling: cov_m =
    * (1000·(n·Σxy − Σx·Σy)) div n², products in decimal(38,0) with the
    * [[groupTrend]] headroom statement, ONE truncating division whose
    * legitimately-negative numerator gets the oracle sign split.
    * Pearson's normalization needs a square root and leaves the integer
    * discipline — callers wanting a bounded statistic use the rank
    * ensemble (row 147) instead; covariance keeps the sign and the
    * exactness. Single-row groups report 0 covariance (not NULL — the
    * statistic is defined and zero). One map-side-combined aggregate of
    * five longs per group. */
  def groupCovariance(df: DataFrame, keyCol: String, xCol: String,
                      yCol: String): DataFrame = {
    val e = df
      .filter(col(keyCol).isNotNull && col(xCol).isNotNull &&
        col(yCol).isNotNull)
      .select(col(keyCol).as("key"), col(xCol).cast("long").as("__x"),
        col(yCol).cast("long").as("__y"))
    e.groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum("__x").as("__sx"), sum("__y").as("__sy"),
        sum(expr("__x * __y")).as("__sxy"))
      .withColumn("__num", expr(
        "cast(n as decimal(38,0)) * __sxy - " +
          "cast(__sx as decimal(38,0)) * __sy"))
      .withColumn("cov_m",
        expr("(1000 * __num) div (cast(n as decimal(38,0)) * n)")
          .cast("long"))
      .select("key", "n", "cov_m")
  }
}
