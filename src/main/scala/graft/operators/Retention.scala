package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the product-analytics staple over an event log:
  * users are cohorted by their FIRST-seen epoch week, and the matrix
  * (cohort_week, week_offset, n_users) counts how many of each cohort
  * were active again k weeks later. Curation reads this too: a data
  * source whose contributor cohorts stop returning is going stale.
  *
  * All integer: weeks are epoch-µs div 604 800 000 000 (epoch-aligned
  * 7-day buckets — same alignment on any engine, no calendar/timezone
  * logic to diverge on), offsets plain differences, counts exact.
  *
  * Scale shape: the event stream collapses FIRST to distinct
  * (user, week) — a map-side-combined aggregate bounded by
  * users × active-weeks, the only corpus-sized shuffle; first-seen weeks
  * are an aggregate OF that frame; the join back is co-partitioned on
  * user_id; the final matrix is ≤ weeks² rows. Null users are excluded
  * (no identity, no cohort — the [[EpochShuffle]] null contract). */
object Retention {

  private val WeekUs = 604800000000L

  /** (cohort_week, week_offset, n_users) from an event frame with a user
    * id column and a timestamp column. */
  def cohortRetention(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val d = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        expr(s"unix_micros($tsCol) div $WeekUs").as("__w"))
      .distinct()
    val first = d.groupBy("__u").agg(min("__w").as("__c"))
    d.join(first, "__u")
      .select(col("__c").as("cohort_week"),
        (col("__w") - col("__c")).as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-seen growth curve — daily new principals and the cumulative
    * unique count: the user-base Heaps curve (row 216 draws it for
    * vocabulary; this is the audience/entity version every growth
    * dashboard opens with). Every principal reduces to its min day —
    * one user-bounded aggregate — the day grid GAP-FILLS from the span
    * (quiet days are explicit zeros, a flat week is visible, not
    * skipped), and the cumulative runs over the timespan-bounded day
    * frame, never the event stream. */
  def firstSeenCurve(events: DataFrame, userCol: String,
                     tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val firsts = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(expr(s"unix_micros($tsCol) div 86400000000L")).as("__d"))
    val perDay = firsts.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("__nu"))
    val grid = perDay.agg(min("day").as("__d0"), max("day").as("__d1"))
      .select(explode(sequence(col("__d0"), col("__d1"))).as("day"))
    grid.join(perDay, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("__nu"), lit(0L)))
      .withColumn("cum_users", sum("new_users").over(
        Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("day", "new_users", "cum_users")
  }

  /** DAU / WAU stickiness — the product-analytics engagement ratio
    * (daily actives over trailing-window actives, ~10000 bp = everyone
    * daily): WAU is an EXACT trailing-k distinct count computed without
    * windowed distinct (not additive, not windowable): each (user,
    * active-day) membership explodes into the k window days it serves —
    * work ×k on the DEDUPED activity frame, never the event stream —
    * then one distinct count per window day. Days inside the span with
    * zero actives carry no row (inner join by construction, documented).
    * stickiness_bp = (10000·dau) div wau. */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
                 k: Int = 7): DataFrame =
    stickinessFromActivity(events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("__u"),
        expr(s"unix_micros($tsCol) div 86400000000L").as("__d"))
      .distinct(), k)

  /** [[stickiness]] from a deduped (__u, __d) activity frame — the
    * shared read half: (user, day) incidence is an EXISTENCE fact, so
    * a monitor that appends per-batch partial incidences collapses to
    * the identical frame under any batch split (the cardinality
    * variant of the additive-counts monitor argument — dedup, don't
    * sum) and the drained ratio equals the batch ratio exactly. */
  def stickinessFromActivity(activity: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"window must be >= 1, got $k")
    val act = activity.select("__u", "__d").distinct()
    val dau = act.groupBy(col("__d").as("day"))
      .agg(count(lit(1)).as("dau"))
    val span = act.agg(max("__d").as("__dmax"))
    val wau = act
      .select(col("__u"),
        explode(sequence(col("__d"), col("__d") + (k - 1))).as("day"))
      .distinct()
      .join(broadcast(span))
      .filter(col("day") <= col("__dmax")) // no phantom post-span days
      .groupBy("day")
      .agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness_bp", expr("(10000 * dau) div wau"))
      .select("day", "dau", "wau", "stickiness_bp")
  }
}
