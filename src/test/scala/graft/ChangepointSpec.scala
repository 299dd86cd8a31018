package graft

import graft.operators.Changepoint

class ChangepointSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600000000L

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(String, Long)]) =
    Changepoint.meanShift(
      rows.map { case (g, t) => (g, ts(t)) }.toDF("event_type", "ts"),
      "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap

  test("a clean level shift is located exactly at its boundary") {
    // 1/hour for hours 0-3, then 5/hour for hours 4-5:
    // best split after hour 3: score = |6*4 - 4*14| = 32 = 4*2*|1-5|
    val rows =
      (0 to 3).map(h => ("a", h * Hour)) ++
        (4 to 5).flatMap(h => (1 to 5).map(i => ("a", h * Hour + i * 1000L)))
    val got = run(rows)
    assert(got("a") == ((6L, 3L, 32L, 1000L, 5000L)), got.toString)
  }

  test("a feed that stops shifts at the stop (gap hours are zero buckets)") {
    // 2/hour for hours 0-2, nothing for hours 3-5, one event at hour 6
    // keeps the span open; series = 2,2,2,0,0,0,1
    val rows = (0 to 2).flatMap(h =>
      Seq(("a", h * Hour), ("a", h * Hour + 1000L))) :+ ("a", 6 * Hour)
    val got = run(rows)
    // S = [2,4,6,6,6,6,7], n=7, sn=7; score(b)=|7*sb - b*7|
    // b=3: |42-21|=21 is max (b=4: |42-28|=14)
    assert(got("a")._1 == 7L)
    assert(got("a")._2 == 2L)    // boundary after hour 2
    assert(got("a")._3 == 21L)
    assert(got("a")._4 == 2000L) // mean before: 2.000/hour
    assert(got("a")._5 == 250L)  // mean after: 1/4 hour = 0.250
  }

  test("flat series: all splits tie at score 0, earliest hour wins") {
    val rows = (0 to 3).map(h => ("a", h * Hour))
    val got = run(rows)
    assert(got("a") == ((4L, 0L, 0L, 1000L, 1000L)), got.toString)
  }

  test("groups are independent; single-bucket groups don't appear") {
    val rows = Seq(("a", 0L), ("a", Hour), ("b", 0L))
    val got = run(rows)
    assert(got.contains("a") && !got.contains("b"), got.toString)
  }

  test("meanShiftFromCounts over split partials == meanShift over events " +
    "(bucket counts are additive)") {
    val rows =
      (0 to 3).map(h => ("a", h * Hour)) ++
        (4 to 5).flatMap(h => (1 to 5).map(i => ("a", h * Hour + i * 1000L)))
    val ev = rows.map { case (g, t) => (g, ts(t)) }.toDF("event_type", "ts")
    val want = Changepoint.meanShift(ev, "event_type", "ts").collect()
      .map(_.toSeq).toSet
    // simulate two microbatches' partial counts sharing hour cells
    import org.apache.spark.sql.functions.{col, expr}
    val counts = ev
      .select(col("event_type").as("grp"),
        expr("unix_micros(ts) div 3600000000L").as("h"),
        (expr("unix_micros(ts)") % 2).as("half"))
      .groupBy("grp", "h", "half").agg(
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("__pc"))
      .groupBy("grp", "h").agg(
        org.apache.spark.sql.functions.sum("__pc").as("c"))
    val got = Changepoint.meanShiftFromCounts(counts).collect()
      .map(_.toSeq).toSet
    assert(got == want, s"got=$got want=$want")
  }

  test("burstiness: constant feed ~0, bursty feed far above 1000, " +
    "gap zeros count") {
    // 'flat': 1/hour for 4 hours -> var 0 -> fano 0
    // 'burst': 8 events in hour 0, none hours 1-3 (span held open by one
    //  event at hour 3... keep exact: hours 0..3 with counts 8,0,0,1)
    val rows =
      (0 to 3).map(h => ("flat", h * Hour)) ++
        (1 to 8).map(i => ("burst", i * 1000L)) :+ ("burst", 3 * Hour)
    val got = Changepoint.burstiness(
      rows.map { case (g, t) => (g, ts(t)) }.toDF("event_type", "ts"),
      "event_type", "ts")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("flat") == ((4L, 1000L, 0L)), got.toString)
    // burst: n=4, s=9, s2=65; fano = 1000*(4*65-81)/(36) = 1000*179/36
    assert(got("burst") == ((4L, 2250L, 179000L / 36L)), got.toString)
  }

  test("plan: windows partition by group (no global sort of the stream)") {
    val df = Changepoint.meanShift(
      Seq(("a", ts(0L)), ("a", ts(Hour))).toDF("event_type", "ts"),
      "event_type", "ts")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(grp"), p)
    assertNoCartesian(df)
  }

  private def acfRun(counts: Seq[Long], k: Int) = {
    val rows = counts.zipWithIndex.flatMap { case (c, h) =>
      (1L to c).map(i => ("a", ts(h * Hour + i * 1000L)))
    }
    Changepoint.autocorrelation(rows.toDF("event_type", "ts"),
      "event_type", "ts", k)
      .collect()
      .map(r => (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long])))
      .head
  }

  test("autocorrelation: a period-2 series is positive at lag 2 and " +
    "negative at lag 1, hand-exact in milli-units") {
    // counts 1,3 alternating over 8 hours: n=8, S=16, deviations ±8
    // den = 8·64 = 512; lag-2 num = 6·64 = 384 → 750; lag-1 num = −448
    // → Spark trunc-div −875
    assert(acfRun(Seq(1L, 3L, 1L, 3L, 1L, 3L, 1L, 3L), 2) ==
      ((8L, Some(750L))))
    assert(acfRun(Seq(1L, 3L, 1L, 3L, 1L, 3L, 1L, 3L), 1) ==
      ((8L, Some(-875L))))
  }

  test("autocorrelation: constant series (zero variance) and series " +
    "shorter than the lag report NULL") {
    assert(acfRun(Seq(2L, 2L, 2L, 2L), 1) == ((4L, None)))
    assert(acfRun(Seq(1L, 2L), 3) == ((2L, None)))
  }

  private def hourlyRows(counts: Seq[Long]) =
    counts.zipWithIndex.flatMap { case (c, h) =>
      (1L to c).map(i => ("a", ts(h * Hour + i * 1000L)))
    }

  test("periodGrowth: exact bp rates with sign split, gap zeros " +
    "explicit, first and zero-predecessor periods NULL") {
    // counts 2, 3, 0(gap), 1 per hour
    val rows = hourlyRows(Seq(2L, 3L, 0L, 0L)) ++
      Seq(("a", ts(3 * Hour + 1000L)))
    val got = Changepoint.periodGrowth(rows.toDF("event_type", "ts"),
      "event_type", "ts", bucketUs = Hour)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(got(0L) == ((2L, None, None)), got.toString)
    assert(got(1L) == ((3L, Some(2L), Some(5000L))))
    assert(got(2L) == ((0L, Some(3L), Some(-10000L))))
    assert(got(3L) == ((1L, Some(0L), None)))
  }

  test("movingAverage: trailing frame with a partial leading edge, " +
    "exact milli means") {
    val rows = hourlyRows(Seq(2L, 3L, 0L, 0L)) ++
      Seq(("a", ts(3 * Hour + 1000L)))
    val got = Changepoint.movingAverage(rows.toDF("event_type", "ts"),
      "event_type", "ts", k = 2, bucketUs = Hour)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(0L -> 2000L, 1L -> 2500L, 2L -> 1500L,
      3L -> 500L), got.toString)
  }

  test("movingAverageFromCounts over summed split partials == " +
    "movingAverage over the events (the monitor additivity)") {
    import org.apache.spark.sql.functions._
    val rows = hourlyRows(Seq(2L, 3L, 1L, 4L, 2L))
    val df = rows.toDF("event_type", "ts")
    val direct = Changepoint.movingAverage(df, "event_type", "ts",
      k = 3, bucketUs = Hour).collect().map(_.toSeq).toSet
    // split the events arbitrarily, count each half, sum the partials
    val h1 = df.filter(hash(col("ts")) % 2 === 0)
    val h2 = df.filter(hash(col("ts")) % 2 =!= 0)
    val partials = Changepoint.bucketCounts(h1, "event_type", "ts", Hour)
      .unionAll(Changepoint.bucketCounts(h2, "event_type", "ts", Hour))
      .groupBy("grp", "h").agg(sum("c").as("c"))
    val merged = Changepoint.movingAverageFromCounts(partials, k = 3)
      .collect().map(_.toSeq).toSet
    assert(merged == direct)
  }

  test("rateCovarianceMatrix: anti-correlated pair hand value over the " +
    "common hours, one row per unordered pair") {
    val rows = hourlyRows(Seq(1L, 2L, 3L)) ++
      Seq(3L, 2L, 1L).zipWithIndex.flatMap { case (c, h) =>
        (1L to c).map(i => ("b", ts(h * Hour + i * 1000L)))
      }
    val got = Changepoint.rateCovarianceMatrix(
      rows.toDF("event_type", "ts"), "event_type", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // n=3, sx=6, sy=6, sxy=10 → num=−6 → 1000·(−6) div 9 = −666
    assert(got == Map(("a", "b") -> ((3L, -666L))), got.toString)
  }

  test("seasonalityProfile: epoch dow identity (day 0 is Thursday=4), " +
    "exact cell shares") {
    val Day = 24 * Hour
    val rows = Seq(
      ("a", ts(5 * Hour)), ("a", ts(5 * Hour + 1000L)),  // Thu 05
      ("a", ts(3 * Day + 23 * Hour)))                    // Sun 23
    val got = Changepoint.seasonalityProfile(
      rows.toDF("event_type", "ts"), "event_type", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map((4L, 5L) -> ((2L, 6666L)),
      (0L, 23L) -> ((1L, 3333L))), got.toString)
  }

  test("seasonalityProfile: pre-1970 timestamps floor-bin (sign-safe " +
    "dow/hod — no negative cells, no off-by-one day)") {
    // −1 s = 1969-12-31 23:59:59, a WEDNESDAY: floor epoch_day = −1 →
    // dow = pmod(3, 7) = 3, hod = pmod(−1, 24) = 23. Truncating div
    // would bin it as day 0 / hour 0 (Thursday midnight).
    val rows = Seq(("a", ts(-1000000L)), ("a", ts(5 * Hour)))
    val got = Changepoint.seasonalityProfile(
      rows.toDF("event_type", "ts"), "event_type", "ts")
      .collect().map(r => (r.getLong(1), r.getLong(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map((3L, 23L) -> ((1L, 5000L)),
      (4L, 5L) -> ((1L, 5000L))), got.toString)
  }

  test("seasonalityFromCounts over summed split partials == " +
    "seasonalityProfile over events (the monitor additivity)") {
    import org.apache.spark.sql.functions._
    val rows = hourlyRows(Seq(2L, 3L, 1L, 4L))
    val df = rows.toDF("event_type", "ts")
    val direct = Changepoint.seasonalityProfile(df, "event_type", "ts")
      .collect().map(_.toSeq).toSet
    def cells(d: org.apache.spark.sql.DataFrame) = d
      .select(col("event_type").as("grp"),
        Changepoint.dowExpr("ts").as("dow"),
        Changepoint.hodExpr("ts").as("hod"))
      .groupBy("grp", "dow", "hod").agg(count(lit(1)).as("n"))
    val h1 = df.filter(hash(col("ts")) % 2 === 0)
    val h2 = df.filter(hash(col("ts")) % 2 =!= 0)
    val partials = cells(h1).unionAll(cells(h2))
      .groupBy("grp", "dow", "hod").agg(sum("n").as("n"))
    val merged = Changepoint.seasonalityFromCounts(partials)
      .collect().map(_.toSeq).toSet
    assert(merged == direct)
  }

  test("gapFilledSeries fails fast on a corrupt-timestamp span instead " +
    "of exploding millions of buckets") {
    import graft.operators.Changepoint
    val counts = Seq(("g", 0L, 1L), ("g", 70000000L, 1L))
      .toDF("grp", "h", "c")
    val err = intercept[Exception] {
      Changepoint.gapFilledSeries(counts, maxBuckets = 1000L).collect()
    }
    assert(err.getMessage.contains("exceeds maxBuckets"),
      err.getMessage.take(200))
    // sane spans still gap-fill
    val ok = Changepoint.gapFilledSeries(
      Seq(("g", 1L, 2L), ("g", 4L, 3L)).toDF("grp", "h", "c"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(ok == Map(1L -> 2L, 2L -> 0L, 3L -> 0L, 4L -> 3L))
  }
}
