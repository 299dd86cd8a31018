package graft

import graft.operators.Trend

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600000000L

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long, Double)]) =
    Trend.groupTrend(
      rows.map { case (u, t, v) => (u, ts(t), v) }
        .toDF("user_id", "ts", "value"),
      "user_id", "ts", "value")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap

  test("hand-computed slope: +1 cent per hour = 1e6 micro-cents") {
    // y = x cents at hours 0, 1, 2 -> slope exactly 1 c/h
    val got = run(Seq(
      (1L, 0L, 0.00), (1L, Hour, 0.01), (1L, 2 * Hour, 0.02)))
    assert(got(1L) == ((3L, Some(1000000L))), got.toString)
  }

  test("negative slope truncates toward zero like the oracle sign-split") {
    // y: 100, 0 cents one hour apart -> slope -100 c/h
    val down = run(Seq((1L, 0L, 1.00), (1L, Hour, 0.00)))
    assert(down(1L) == ((2L, Some(-100000000L))), down.toString)
    // non-integral negative slope: (0, 100c), (1h, 0c), (2h, 1c)
    // n=3 sx=3 sy=101 sxy=2 sxx=5; num=1e6*(6-303)=-297e6 den=15-9=6
    // -297e6/6 = -49.5e6 exactly; use an odd case: y=(100,0,2)
    // sy=102 sxy=4 num=1e6*(12-306)=-294e6 den=6 -> -49e6
    val frac = run(Seq(
      (2L, 0L, 1.00), (2L, Hour, 0.00), (2L, 2 * Hour, 0.02)))
    assert(frac(2L)._2 == Some(-49000000L), frac.toString)
  }

  test("a single distinct hour bucket has no defined trend (NULL)") {
    val got = run(Seq(
      (1L, 1000L, 1.00), (1L, 2000L, 2.00))) // same hour bucket
    assert(got(1L) == ((2L, None)), got.toString)
  }

  test("events within the same bucket aggregate into the fit, not average") {
    // two points at hour 0 (0c, 200c), one at hour 1 (100c):
    // n=3 sx=1 sy=300 sxy=100 sxx=1
    // num=1e6*(300-300)=0 den=3-1=2 -> slope 0
    val got = run(Seq(
      (1L, 0L, 0.00), (1L, 1000L, 2.00), (1L, Hour, 1.00)))
    assert(got(1L) == ((3L, Some(0L))), got.toString)
  }

  test("null key/ts/value rows are excluded; aggregation is partial") {
    val df = Seq(
      (Some(1L), Some(ts(0L)), Some(1.0)),
      (None: Option[Long], Some(ts(0L)), Some(1.0)),
      (Some(1L), None: Option[java.sql.Timestamp], Some(1.0)),
      (Some(1L), Some(ts(Hour)), None: Option[Double]))
      .toDF("user_id", "ts", "value")
    val out = Trend.groupTrend(df, "user_id", "ts", "value")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L), got.toString)
    val p = out.queryExecution.executedPlan.toString
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"sufficient-statistics aggregate not split partial/final:\n$p")
  }

  test("groupCovariance: exact milli covariance with truncation toward " +
    "zero on both signs; single points are zero") {
    import spark.implicits._
    def cov(rows: Seq[(String, Long, Long)]) =
      graft.operators.Trend.groupCovariance(
        rows.toDF("k", "x", "y"), "k", "x", "y")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2)))).toMap
    // rising: num = 3·50 − 3·30 = 60 → 60000 div 9 = 6666
    assert(cov(Seq(("a", 0L, 0L), ("a", 1L, 10L), ("a", 2L, 20L))) ==
      Map("a" -> ((3L, 6666L))))
    // falling: the same magnitude, negative, trunc toward zero
    assert(cov(Seq(("a", 0L, 20L), ("a", 1L, 10L), ("a", 2L, 0L))) ==
      Map("a" -> ((3L, -6666L))))
    assert(cov(Seq(("a", 5L, 7L))) == Map("a" -> ((1L, 0L))))
  }
}
