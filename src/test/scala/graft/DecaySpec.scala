package graft

import graft.operators.Decay

class DecaySpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long, Double)],
                  halfLife: Long = Day) =
    Decay.decayedScore(
      rows.map { case (u, t, v) => (u, ts(t), v) }
        .toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", halfLife)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("hand-computed decay: weight halves per whole half-life") {
    // now = max ts = 10 days. ages: 0 d -> 1e6, 1 d -> 5e5, 2.5 d -> 2.5e5
    val got = run(Seq(
      (1L, 10L * Day, 2.00),            // 200 c · 1e6
      (1L, 9L * Day, 1.00),             // 100 c · 5e5
      (2L, 10L * Day - 5L * Day / 2, 4.00))) // 400 c · 250000
    assert(got(1L) == (2L, 200L * 1000000L + 100L * 500000L), got.toString)
    assert(got(2L) == (1L, 400L * 250000L))
  }

  test("ages beyond 62 half-lives clamp to weight zero, not an overflow") {
    val got = run(Seq((1L, 100L * Day, 1.00), (1L, 0L, 1000.00)))
    assert(got(1L) == (2L, 100L * 1000000L + 0L), got.toString)
  }

  test("cents are HALF_UP of value·100 (the §5 money rule)") {
    val got = run(Seq((1L, Day, 0.125), (1L, Day, 0.114)))
    // 12.5 -> 13, 11.4 -> 11 cents, both at weight 1e6
    assert(got(1L)._2 == (13L + 11L) * 1000000L, got.toString)
  }

  test("null key/ts/value rows are excluded") {
    val df = Seq(
      (Some(1L), Some(ts(Day)), Some(1.0)),
      (None: Option[Long], Some(ts(Day)), Some(9.0)),
      (Some(1L), None: Option[java.sql.Timestamp], Some(9.0)),
      (Some(1L), Some(ts(Day)), None: Option[Double]))
      .toDF("user_id", "ts", "value")
    val got = Decay.decayedScore(df, "user_id", "ts", "value", Day)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L), got.toString)
  }

  test("plan: single-row now attach broadcasts; the aggregate is partial") {
    val df = Decay.decayedScore(
      Seq((1L, ts(0L), 1.0)).toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", Day)
    val p = df.queryExecution.executedPlan.toString
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"aggregate not split partial/final:\n$p")
  }
}
