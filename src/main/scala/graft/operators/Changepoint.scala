package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-group (grp, h, c) bucket counts from an event frame — the raw
    * series every rate analysis here starts from.
    *
    * CONTRACT: timestamps at/after epoch. `div` truncates toward zero,
    * so pre-1970 micros would share bucket 0 with the first post-epoch
    * hour and sit one bucket late elsewhere (the [[dowExpr]] caveat);
    * the DuckDB oracle's `//` binds the same way, so the two engines
    * agree — but both mis-bin negative time. Shift archival pre-epoch
    * data to a non-negative origin before bucketing. */
  def bucketCounts(events: DataFrame, groupCol: String, tsCol: String,
                   bucketUs: Long = 3600000000L): DataFrame =
    events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"),
        expr(s"unix_micros($tsCol) div ${bucketUs}L").as("h"))
      .groupBy("grp", "h").agg(count(lit(1)).as("c"))

  /** Gap-fill a (grp, h, c) count frame over each group's min..max hour
    * (missing buckets become explicit zeros). `maxBuckets` is the
    * ksDistance-style outage guard, enforced IN-PLAN (zero extra
    * actions): one corrupt year-9999 timestamp would otherwise explode
    * ~70M buckets for its group, multiplied across every meanShift /
    * autocorrelation / burstiness caller — fail fast with the offending
    * span instead. */
  def gapFilledSeries(counts: DataFrame,
                      maxBuckets: Long = 10000000L): DataFrame = {
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")
    val span = counts.groupBy("grp")
      .agg(min("h").as("__h0"), max("h").as("__h1"))
      .withColumn("__h1", expr(
        s"CASE WHEN __h1 - __h0 + 1 <= ${maxBuckets}L THEN __h1 " +
          "ELSE CAST(raise_error(concat('gapFilledSeries: group span ', " +
          "CAST(__h1 - __h0 + 1 AS STRING), " +
          s" ' buckets exceeds maxBuckets $maxBuckets — corrupt " +
          "timestamp? (bucket the column or raise the cap deliberately)'))" +
          " AS BIGINT) END"))
    span
      .select(col("grp"), explode(sequence(col("__h0"), col("__h1"))).as("h"))
      .join(counts, Seq("grp", "h"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
  }

  /** (group, n_buckets, cp_hour, score, mean_before_m, mean_after_m):
    * the best split per group — boundary AFTER epoch-hour `cp_hour`,
    * means in milli-events/bucket. */
  def meanShift(events: DataFrame, groupCol: String, tsCol: String,
                bucketUs: Long = 3600000000L): DataFrame =
    meanShiftFromCounts(bucketCounts(events, groupCol, tsCol, bucketUs))

  /** [[meanShift]] from a pre-aggregated (grp, h, c) count frame — the
    * shared read half: bucket counts are ADDITIVE across microbatches,
    * so feeding the collapsed monitor table here yields exactly the
    * batch answer (the q122/q157 monitor argument). */
  def meanShiftFromCounts(counts: DataFrame): DataFrame = {
    val series = gapFilledSeries(counts)
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

  /** Lag-k autocorrelation of each group's gap-filled hourly count
    * series — the periodicity read beside [[meanShift]] (level shifts)
    * and [[burstiness]] (dispersion): k=24 on hourly buckets asks "is
    * this feed diurnal", a strong machine-traffic signature when high
    * and a flat-crawler signature when absent. Exact integer milli-units:
    * with S = Σc and n buckets, the centered products scale by n² —
    * acf = Σ'(n·c_t−S)(n·c_{t−k}−S) / Σ(n·c_t−S)² over integer terms
    * (products in decimal(38,0)), emitted as (1000·num) div den with the
    * truncating-div sign split mirrored in the oracle (num is
    * legitimately negative for anti-correlated feeds; den ≥ 0). NULL
    * when the series is constant (den 0) or shorter than k (no pairs).
    * The lag window and the two aggregates run over the groups × timespan
    * series frame — the [[meanShiftFromCounts]] bound, never raw events. */
  def autocorrelation(events: DataFrame, groupCol: String, tsCol: String,
                      k: Int, bucketUs: Long = 3600000000L): DataFrame = {
    require(k >= 1, "autocorrelation lag must be >= 1")
    val series = gapFilledSeries(bucketCounts(events, groupCol, tsCol,
      bucketUs))
    val stats = series.groupBy("grp")
      .agg(count(lit(1)).as("__n"), sum("c").as("__s"))
    val w = Window.partitionBy("grp").orderBy("h")
    series
      .withColumn("__cl", lag(col("c"), k).over(w))
      .join(stats, Seq("grp"))
      .withColumn("__d",
        expr("cast(__n as decimal(38,0)) * c - __s"))
      .withColumn("__dl",
        expr("cast(__n as decimal(38,0)) * __cl - __s"))
      .groupBy("grp")
      .agg(max("__n").as("n_buckets"),
        sum(when(col("__dl").isNotNull, expr("__d * __dl"))).as("__num"),
        sum(expr("__d * __d")).as("__den"))
      .withColumn("acf_m",
        when(col("__den") =!= 0 && col("__num").isNotNull,
          expr("(1000 * __num) div __den")).cast("long"))
      .select("grp", "n_buckets", "acf_m")
  }

  /** Period-over-period growth — per group, each gap-filled period's
    * count against its predecessor as an exact bp rate (weekly buckets
    * by default: the WoW dashboard read). Gap periods are explicit
    * zeros, so a feed that stops shows −10000 bp then NULL (zero
    * predecessor has no defined rate) rather than silently skipping to
    * its next active week; the first period is NULL (no predecessor).
    * growth_bp = ((c − prev)·10000) div prev — the numerator's sign
    * split is mirrored in the oracle. Lag window over the shared
    * groups × timespan series frame. */
  def periodGrowth(events: DataFrame, groupCol: String, tsCol: String,
                   bucketUs: Long = 7L * 86400000000L): DataFrame = {
    val series = gapFilledSeries(bucketCounts(events, groupCol, tsCol,
      bucketUs))
    series
      .withColumn("prev",
        lag(col("c"), 1).over(Window.partitionBy("grp").orderBy("h")))
      .withColumn("growth_bp",
        when(col("prev") > 0,
          expr("((c - prev) * 10000) div prev")))
      .select(col("grp"), col("h").as("period"), col("c"), col("prev"),
        col("growth_bp"))
  }

  /** Trailing moving average of the gap-filled series in exact
    * milli-units — the smoothing read under every rate dashboard:
    * ma_m = (1000·Σ window counts) div window-rows, over the trailing
    * k buckets INCLUDING the current one; the leading edge averages the
    * partial frame it actually has (documented — padding with phantom
    * zeros would understate early rates). Rolling window per group over
    * the shared bounded series frame. */
  def movingAverage(events: DataFrame, groupCol: String, tsCol: String,
                    k: Int = 7,
                    bucketUs: Long = 86400000000L): DataFrame =
    movingAverageFromCounts(bucketCounts(events, groupCol, tsCol,
      bucketUs), k)

  /** The read half of [[movingAverage]] over a pre-reduced (grp, h, c)
    * count frame — shared by the batch wrapper and the streaming
    * monitor (additive hourly partials collapse to the identical
    * series, so the drained MA equals the batch MA exactly — the
    * meanShiftFromCounts split, applied to smoothing). */
  def movingAverageFromCounts(counts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"window must be >= 1, got $k")
    val series = gapFilledSeries(counts)
    val w = Window.partitionBy("grp").orderBy("h")
      .rowsBetween(-(k - 1).toLong, Window.currentRow)
    series
      .withColumn("__s", sum("c").over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .select(col("grp"), col("h").as("period"), col("c"),
        expr("(1000 * __s) div __n").as("ma_m"))
  }

  /** Pairwise rate covariance matrix — [[graft.operators.Trend.groupCovariance]]'s
    * fold applied to every unordered GROUP PAIR's hourly series over
    * their COMMON observed hours (the equi-join on the hour intersects
    * the two gap-filled spans — covariance over disjoint spans is
    * undefined and silently zero-padding would fabricate correlation,
    * documented): cov_m = (1000·(n·Σxy − Σx·Σy)) div n², the co-moving
    * vs independent feed read at matrix granularity. The self-join keys
    * on the hour over the groups × timespan series frame; aggregates
    * are one map-side-combined pass per pair (≤ |groups|² rows out). */
  def rateCovarianceMatrix(events: DataFrame, groupCol: String,
                           tsCol: String,
                           bucketUs: Long = 3600000000L): DataFrame = {
    val se = gapFilledSeries(bucketCounts(events, groupCol, tsCol,
      bucketUs))
    se.as("a")
      .join(se.as("b"), col("a.h") === col("b.h") &&
        col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("a.c")).as("__sx"), sum(col("b.c")).as("__sy"),
        sum(col("a.c") * col("b.c")).as("__sxy"))
      .withColumn("__num", expr(
        "cast(n as decimal(38,0)) * __sxy - " +
          "cast(__sx as decimal(38,0)) * __sy"))
      .withColumn("cov_m",
        expr("(1000 * __num) div (cast(n as decimal(38,0)) * n)")
          .cast("long"))
      .select("grp_a", "grp_b", "n", "cov_m")
  }

  /** Weekly seasonality profile — per group, the (day-of-week ×
    * hour-of-day) load matrix with each cell's share of the group's
    * total in bp: the traffic heatmap behind capacity planning and the
    * "does this feed keep office hours" bot read beside
    * [[autocorrelation]]'s lag-24 number. Day-of-week is the pure
    * integer identity pmod(epoch_day + 4, 7) (1970-01-01 was a
    * Thursday; 0 = Sunday) — no engine or locale dow function to
    * disagree, and epoch_day is a true FLOOR division
    * ((us − pmod(us, day)) div day): `div`/`%` truncate toward zero, so
    * the naive form mis-bins pre-1970 timestamps by a day and emits
    * negative dow cells; the pmod formulation is sign-safe for any
    * epoch. One map-side-combined count over ≤ |groups|·168 cells, the
    * per-group total as a window over that cell frame. */
  def seasonalityProfile(events: DataFrame, groupCol: String,
                         tsCol: String): DataFrame =
    seasonalityFromCounts(events
      .filter(col(groupCol).isNotNull && col(tsCol).isNotNull)
      .select(col(groupCol).as("grp"),
        dowExpr(tsCol).as("dow"), hodExpr(tsCol).as("hod"))
      .groupBy("grp", "dow", "hod")
      .agg(count(lit(1)).as("n")))

  /** Sign-safe day-of-week (0 = Sunday) of a timestamp column: floor
    * epoch-day via the pmod identity, then pmod(+4, 7). Shared with the
    * streaming seasonality monitor so both halves bin identically. */
  def dowExpr(tsCol: String): Column = {
    val us = s"unix_micros($tsCol)"
    expr(s"pmod((($us - pmod($us, 86400000000L)) div 86400000000L) + 4, 7)")
  }

  /** Sign-safe hour-of-day: floor epoch-hour, then pmod 24. */
  def hodExpr(tsCol: String): Column = {
    val us = s"unix_micros($tsCol)"
    expr(s"pmod(($us - pmod($us, 3600000000L)) div 3600000000L, 24)")
  }

  /** [[seasonalityProfile]] from a pre-reduced (grp, dow, hod, n) count
    * frame — the shared read half: cell counts are additive across
    * microbatches, so the collapsed monitor table yields the batch
    * heatmap exactly. */
  def seasonalityFromCounts(counts: DataFrame): DataFrame =
    counts
      .withColumn("__tot", sum("n").over(Window.partitionBy("grp")))
      .withColumn("share_bp", expr("(10000 * n) div __tot"))
      .select("grp", "dow", "hod", "n", "share_bp")

  /** Burstiness / Fano factor per group over the gap-filled series —
    * the dispersion diagnosis next to [[meanShift]]'s level shifts and
    * [[Robust.rateSpikes]]'s outliers: a Poisson-ish feed sits near
    * fano_m = 1000 (variance ≈ mean), machine bursts push it far above,
    * a rate-limited constant feed far below. fano = population variance
    * over mean = (n·Σc² − S²) / (n·S), carried as one integer division
    * in milli-units; every intermediate is non-negative int64 (Σc² ≤
    * bucket-count · max-rate², documented headroom), so no sign split.
    * Groups with S = 0 can't occur (a group exists only via ≥ 1 event).
    */
  def burstiness(events: DataFrame, groupCol: String, tsCol: String,
                 bucketUs: Long = 3600000000L): DataFrame =
    gapFilledSeries(bucketCounts(events, groupCol, tsCol, bucketUs))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_buckets"),
        sum("c").as("__s"), sum(expr("c * c")).as("__s2"))
      .withColumn("mean_m", expr("(1000 * __s) div n_buckets"))
      .withColumn("fano_m", expr(
        "(1000 * (n_buckets * __s2 - __s * __s)) div (n_buckets * __s)"))
      .select("grp", "n_buckets", "mean_m", "fano_m")
}
