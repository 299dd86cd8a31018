package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group statistics over an INTEGRAL value column: exact
  * lower-nearest-rank quantiles, median/MAD, and the median±k·MAD outlier
  * screen — the curation filter for "drop documents whose length (token
  * count, compression ratio, …) is pathological FOR THEIR SOURCE", where
  * mean/stddev would be dragged by the very outliers being hunted.
  *
  * Exactness without a row-level rank window: quantiles are computed on
  * the (group, value)-COUNT frame — the cumulative-sum window runs over
  * DISTINCT values per group (bounded by value cardinality, e.g. ≤ a few
  * thousand distinct lengths, regardless of row count), never over rows.
  * The quantile definition is integer-exact: the smallest value whose
  * cumulative count × 10⁴ reaches qBp × total — no interpolation, no
  * floats, so an independent SQL replay lands on the same integers.
  */
object Robust {

  /** (groupCol, q_value): the exact qBp-quantile (basis points, lower
    * nearest rank) of `valCol` per group. */
  def groupQuantile(df: DataFrame, groupCol: String, valCol: String,
                    qBp: Int): DataFrame = {
    require(qBp >= 1 && qBp <= 10000, s"qBp must be in [1, 10000], got $qBp")
    // NULL values are EXCLUDED (the SQL-aggregate convention): Spark's
    // window orders NULLs first while DuckDB orders them last, so letting
    // a NULL into the cumulative count would skew quantiles and diverge
    // between engines
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val byGroup = Window.partitionBy(groupCol)
    val cum = sum(col("__cnt"))
      .over(byGroup.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, 0))
    val tot = sum(col("__cnt")).over(byGroup)
    counts
      .withColumn("__cum", cum).withColumn("__tot", tot)
      .filter(col("__cum") * 10000L >= lit(qBp.toLong) * col("__tot"))
      .groupBy(groupCol)
      .agg(min(col("__v")).as("q_value"))
  }

  /** (groupCol, median, mad, n): exact median and median-absolute-
    * deviation per group. Two quantile passes — the second over the
    * |x − median| deviations after a broadcast-joinable medians frame
    * (one row per group) rejoins the data. */
  def medianMad(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    val med = groupQuantile(df, groupCol, valCol, 5000)
      .withColumnRenamed("q_value", "median")
    val dev = df.join(broadcast(med), groupCol)
      .withColumn("__dev", abs(col(valCol) - col("median")))
    val mad = groupQuantile(dev, groupCol, "__dev", 5000)
      .withColumnRenamed("q_value", "mad")
    val n = df.groupBy(groupCol).agg(count(lit(1)).as("n"))
    med.join(mad, groupCol).join(n, groupCol)
  }

  /** Per-row spike flags against the group's own robust baseline: every
    * input row (typically a per-time-bucket count) comes back with its
    * group median, MAD, and spike = 1 iff |v − median| > k·MAD (strict,
    * integer) — the rate-anomaly monitor shape, robust exactly because
    * the outliers being hunted cannot drag the baseline. MAD = 0 (over
    * half the buckets at one count) degenerates to "any deviation
    * flags", documented rather than fudged. Passthrough columns ride
    * along; the stats frame is one row per group, broadcast back. */
  def rateSpikes(counts: DataFrame, groupCol: String, valCol: String,
                 k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // LEFT join: a group whose values are all NULL has no baseline row,
    // and an inner join would silently drop its buckets from the monitor
    // — the loudest possible anomaly vanishing without an error; with
    // NULL stats the when() condition is NULL → spike 0, rows retained
    counts.join(
        broadcast(medianMad(counts, groupCol, valCol)
          .select(col(groupCol), col("median"), col("mad"))),
        Seq(groupCol), "left")
      .withColumn("spike",
        when(abs(col(valCol) - col("median")) > lit(k.toLong) * col("mad"),
          1L).otherwise(0L))
  }

  /** Per-group winsorization — clip `valCol` into its group's
    * [loBp, hiBp] exact quantile band instead of dropping rows (the
    * gentler alternative to the outlier screen when the row should
    * survive but its value shouldn't dominate a downstream aggregate,
    * e.g. length features feeding a mixture weight). Every row comes
    * back with the clipped value and a flag; bounds are the same
    * lower-nearest-rank integers as [[groupQuantile]], broadcast back
    * as one row per group. */
  def winsorize(df: DataFrame, groupCol: String, valCol: String,
                loBp: Int, hiBp: Int): DataFrame = {
    require(1 <= loBp && loBp < hiBp && hiBp <= 10000,
      s"need 1 ≤ loBp < hiBp ≤ 10000, got $loBp/$hiBp")
    val lo = groupQuantile(df, groupCol, valCol, loBp)
      .withColumnRenamed("q_value", "q_lo")
    val hi = groupQuantile(df, groupCol, valCol, hiBp)
      .withColumnRenamed("q_value", "q_hi")
    // LEFT join (rows of a group with no quantile row pass through
    // unclipped — least/greatest skip the NULL bounds), and an explicit
    // NULL guard on the value: Spark's least/greatest SKIP null
    // arguments, so a NULL measurement would otherwise come back as the
    // group's q_hi with was_clipped = 0 — a fabricated high-band value
    df.join(broadcast(lo.join(hi, groupCol)), Seq(groupCol), "left")
      .withColumn("clipped",
        when(col(valCol).isNull, lit(null))
          .otherwise(greatest(least(col(valCol), col("q_hi")), col("q_lo"))))
      .withColumn("was_clipped",
        when(col(valCol).isNull, lit(null).cast("long"))
          .otherwise(when(
            col(valCol) < col("q_lo") || col(valCol) > col("q_hi"), 1L)
            .otherwise(0L)))
  }

  /** Per-group outlier report: (groupCol, median, mad, n, n_outliers)
    * where an outlier has |x − median| > k·MAD (strict, integer). With
    * MAD = 0 (over half the group at one value) only values differing
    * from the median at all can be outliers when k ≥ 1. */
  def outlierScreen(df: DataFrame, groupCol: String, valCol: String,
                    k: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val stats = medianMad(df, groupCol, valCol)
    df.join(broadcast(stats.select(col(groupCol), col("median"), col("mad"))),
        groupCol)
      .withColumn("__out",
        when(abs(col(valCol) - col("median")) > lit(k.toLong) * col("mad"),
          1L).otherwise(0L))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum(col("__out")).as("n_outliers"),
        min(col("median")).as("median"), min(col("mad")).as("mad"))
      .select(col(groupCol), col("median"), col("mad"), col("n"),
        col("n_outliers"))
  }

  /** Multi-quantile table in ONE pass — [[groupQuantile]] generalized:
    * all requested quantiles come off a single distinct-value cumulative
    * frame (the per-quantile-call formulation re-scans the counts once
    * per point; a decile grid would pay nine passes). The quantile list
    * explodes against the counts frame BEFORE the threshold filter —
    * multiplying only the distinct-value frame, never rows — and each
    * (group, q) takes the minimal satisfying value: the same
    * lower-nearest-rank rule, point by point. */
  def groupQuantiles(df: DataFrame, groupCol: String, valCol: String,
                     qBps: Seq[Int]): DataFrame = {
    require(qBps.nonEmpty && qBps.forall(q => q >= 1 && q <= 10000),
      s"quantiles must be in [1, 10000], got $qBps")
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val byGroup = Window.partitionBy(groupCol)
    val cum = sum(col("__cnt"))
      .over(byGroup.orderBy(col("__v"))
        .rowsBetween(Window.unboundedPreceding, 0))
    counts
      .withColumn("__cum", cum)
      .withColumn("__tot", sum(col("__cnt")).over(byGroup))
      .withColumn("q_bp", explode(array(qBps.map(q => lit(q.toLong)): _*)))
      .filter(col("__cum") * 10000L >= col("q_bp") * col("__tot"))
      .groupBy(col(groupCol), col("q_bp"))
      .agg(min(col("__v")).as("q_value"))
  }

  /** Exact cumulative-distribution enrichment — every row comes back
    * with pct_bp = (10000 · #rows in its group with value ≤ its value)
    * div group size: the "relative standing" read ([[Sampling]]'s ntile
    * buckets; this is the continuous rank a reranker or calibration
    * table wants). Computed on the distinct-value cumulative frame and
    * hash-joined back on (group, value) — the corpus never sorts; NULL
    * values keep their row with a NULL pct. */
  def cumeDistBp(df: DataFrame, groupCol: String, valCol: String)
      : DataFrame = {
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val byGroup = Window.partitionBy(groupCol)
    val ranks = counts
      .withColumn("__cum", sum(col("__cnt"))
        .over(byGroup.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__tot", sum(col("__cnt")).over(byGroup))
      // renamed keys: the rank frame derives from df, and a self-join on
      // same-named columns would resolve ambiguously
      .select(col(groupCol).as("__rg"), col("__v"),
        expr("(10000 * __cum) div __tot").as("pct_bp"))
    df.join(ranks,
        df(groupCol) === col("__rg") && df(valCol) === col("__v"), "left")
      .drop("__rg", "__v")
  }

  /** Kolmogorov–Smirnov distance of every group's value distribution
    * from the pooled corpus — the distribution-shift read for NUMERIC
    * columns beside row 150's token-level PSI: ks_bp = max over the
    * value grid of |cdf_group − cdf_pooled| in bp, computed EXACTLY —
    * the max of |cum_g·n_all − cum_all·n_g| / (n_g·n_all) over distinct
    * values, every term an integer (products in decimal(38,0) with the
    * row-202 headroom statement). The step functions are compared at
    * every DISTINCT corpus value via a groups × distinct-values grid
    * (the declared frame bound — distribution comparison needs the
    * union grid, and both factors are vocabulary-, not corpus-, sized);
    * per-group cumulative windows run over that grid.
    *
    * `maxGridValues` is the q18 hot-gram philosophy applied to the grid:
    * the operator serves BANDED/quantized columns, and on a continuous
    * 100 TB column the "vocabulary-sized" grid silently becomes
    * corpus-sized — the guard counts distinct values first (one
    * map-side-combined pass over the count frame the query needs
    * anyway) and fails fast with a banding pointer instead of launching
    * the outage. Pre-band wide columns via [[Sampling.scoreNtile]] or
    * width-bucketing; the KS statistic on the banded column is the KS
    * of the banded distributions, which is what a drift monitor wants. */
  def ksDistance(df: DataFrame, groupCol: String, valCol: String,
                 maxGridValues: Long = 1000000L): DataFrame =
    ksDistanceFromCounts(df
      .filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__cg")), maxGridValues)

  /** [[ksDistance]] from a pre-reduced (grp, __v, __cg) count frame —
    * the shared read half: value counts are additive across
    * microbatches, so the collapsed monitor table yields exactly the
    * batch statistic (the pooled side derives from the SAME counts by
    * summing over groups). Carries [[ksDistance]]'s distinct-value
    * guard (both declared entry points must refuse the same outage). */
  def ksDistanceFromCounts(gCountsIn: DataFrame,
                           maxGridValues: Long = 1000000L): DataFrame = {
    require(maxGridValues >= 1, s"maxGridValues must be >= 1, got $maxGridValues")
    // The guard count is a separate action; its lineage is COLUMN-PRUNED
    // to the distinct __v values (the aggregation's shuffle still runs,
    // but only the 8-byte value column flows), so the honest trade was
    // measured, not assumed: persisting the full-width count frame to
    // share it with the main plan costs MORE at bench scale than letting
    // the guard recompute its pruned pass (cache materialization +
    // storage traffic ≈ 2-3x the query; and an eager cache release would
    // need a report localCheckpoint on top). Guard recompute it is —
    // and the frame the main plan aggregates is vocabulary-, not
    // corpus-, sized either way.
    val gCounts = gCountsIn
    val nDistinct = gCounts.select("__v").distinct().count()
    require(nDistinct <= maxGridValues,
      s"ksDistance grid would span $nDistinct distinct values " +
        s"(> maxGridValues = $maxGridValues): the groups × values grid " +
        "would be corpus-sized. Band the column first (Sampling.scoreNtile " +
        "or width-bucket it) — KS on the banded column is the banded " +
        "distributions' KS, the drift read this operator serves — or " +
        "raise maxGridValues deliberately.")
    val allCum = gCounts.groupBy("__v").agg(sum("__cg").as("__ca"))
      .withColumn("__cumA", sum("__ca").over(
        Window.orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__nA", sum("__ca").over(
        Window.partitionBy()
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .select("__v", "__cumA", "__nA")
    val groups = gCounts.groupBy("grp").agg(sum("__cg").as("n_group"))
    val wg = Window.partitionBy("grp").orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val out = groups.crossJoin(allCum)
      .join(gCounts, Seq("grp", "__v"), "left")
      .withColumn("__cumG",
        sum(coalesce(col("__cg"), lit(0L))).over(wg))
      .withColumn("__d", expr(
        "abs(cast(__cumG as decimal(38,0)) * __nA - " +
          "cast(__cumA as decimal(38,0)) * n_group)"))
      .withColumn("__bp", expr(
        "cast((10000 * __d) div " +
          "(cast(n_group as decimal(38,0)) * __nA) as bigint)"))
      .groupBy("grp", "n_group")
      .agg(max("__bp").as("ks_bp"))
    out
  }

  /** Per-group min-max feature scaling — the normalization pass run
    * before any distance-based consumer (kNN labeling, ANN probes,
    * mixture scoring) so one wide-range feature can't dominate: every
    * row comes back with scaled_bp = ((v − min)·10000) div (max − min)
    * in [0, 10000], exact integer arithmetic on the caller's integer
    * units. Constant groups (max = min) scale to NULL — there is no
    * spread to normalize, and emitting an arbitrary midpoint would be a
    * silent lie. One map-side-combined (min, max) aggregate per group
    * broadcast back onto the scan; no window, no sort. */
  def scaleMinMax(df: DataFrame, groupCol: String, valCol: String)
      : DataFrame = {
    val stats = df.groupBy(groupCol)
      .agg(min(col(valCol)).as("__lo"), max(col(valCol)).as("__hi"))
    df.join(broadcast(stats), groupCol)
      // decimal(38,0) headroom (the ksDistance/diversity rule): a
      // wide-range integer column — epoch micros spanning ~1.7e18 —
      // overflows (v − lo)·10⁴ in raw int64; decimal keeps it exact and
      // `div` still returns the same BIGINT basis points
      .withColumn("scaled_bp",
        when(col("__hi") =!= col("__lo"),
          expr(s"((CAST($valCol AS DECIMAL(38,0)) - __lo) * 10000) div " +
            "(CAST(__hi AS DECIMAL(38,0)) - __lo)")))
      .drop("__lo", "__hi")
  }
}
