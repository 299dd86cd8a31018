package graft

import graft.operators.Churn

class ChurnSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long)]) =
    Churn.labels(
      rows.map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts"),
      "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap

  test("hand-built cohort: churned vs retained vs excluded") {
    // span days 0..9 -> split at day 5
    val rows = Seq(
      (1L, 0L), (1L, Day), (1L, Day),          // u1: w1 only -> churned
      (2L, 0L), (2L, 6L * Day), (2L, 7L * Day), // u2: both -> retained
      (3L, 8L * Day),                           // u3: w2 only -> excluded
      (4L, 9L * Day))                           // pins d1 = 9
    val got = run(rows)
    assert(got(1L) == ((3L, 2L, 0L, 0L, 1L)), got.toString)
    assert(got(2L) == ((1L, 1L, 2L, 2L, 0L)), got.toString)
    assert(!got.contains(3L))
  }

  test("distinct active days collapse repeats within a day") {
    val rows = Seq(
      (1L, 0L), (1L, 1000000L), (1L, 2000000L), // same day 0, 3 events
      (2L, 9L * Day))
    val got = run(rows)
    assert(got(1L) == ((3L, 1L, 0L, 0L, 1L)), got.toString)
  }

  test("the split day boundary is (d0 + d1 + 1) div 2, second half " +
    "inclusive") {
    // span 0..9: split = 5; an event exactly at day 5 is w2
    val rows = Seq((1L, 0L), (1L, 5L * Day), (2L, 9L * Day))
    val got = run(rows)
    assert(got(1L) == ((1L, 1L, 1L, 1L, 0L)), got.toString)
  }

  test("firstSeenCurve: min-day firsts, gap-filled zeros, cumulative") {
    import spark.implicits._
    val Day = 86400000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // u1 first day 0 (re-seen day 2 must not recount), u2 day 0,
    // u3 day 3 — day 1 and 2 are zero-new days
    val rows = Seq((1L, 0L), (1L, 2 * Day), (2L, 0L), (3L, 3 * Day))
      .map { case (u, t) => (u, ts(t + 1000L)) }
    val got = graft.operators.Retention.firstSeenCurve(
      rows.toDF("user_id", "ts"), "user_id", "ts")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(0L -> ((2L, 2L)), 1L -> ((0L, 2L)),
      2L -> ((0L, 2L)), 3L -> ((1L, 3L))), got.toString)
  }

  test("stickiness: exact trailing-window distinct actives; no phantom " +
    "post-span days") {
    import spark.implicits._
    val Day = 86400000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    // u1 active d0, d1; u2 active d0 (twice — dedup)
    val rows = Seq((1L, 0L), (1L, Day), (2L, 0L), (2L, 1000000L))
      .map { case (u, t) => (u, ts(t + 1000L)) }
    val got = graft.operators.Retention.stickiness(
      rows.toDF("user_id", "ts"), "user_id", "ts", k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // d0: dau 2, wau 2 -> 10000; d1: dau 1, wau 2 (u2 serves d1) -> 5000
    assert(got == Map(0L -> ((2L, 2L, 10000L)), 1L -> ((1L, 2L, 5000L))),
      got.toString)
  }

  test("stickinessFromActivity over unioned split incidences == " +
    "stickiness over events (existence collapse, not sums)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val Day = 86400000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val rows = (1 to 60).map(i =>
      ((i % 7).toLong, ts((i % 5) * Day + i * 1000L)))
    val df = rows.toDF("user_id", "ts")
    val direct = graft.operators.Retention.stickiness(
      df, "user_id", "ts", k = 3).collect().map(_.toSeq).toSet
    def inc(d: org.apache.spark.sql.DataFrame) = d
      .select(col("user_id").as("__u"),
        expr("unix_micros(ts) div 86400000000L").as("__d")).distinct()
    // a user's same-day events split across both halves — the dedup
    // (not a sum) must absorb the double-reported incidence
    val h1 = df.filter(hash(col("ts")) % 2 === 0)
    val h2 = df.filter(hash(col("ts")) % 2 =!= 0)
    val merged = graft.operators.Retention.stickinessFromActivity(
      inc(h1).unionAll(inc(h2)), k = 3).collect().map(_.toSeq).toSet
    assert(merged == direct)
  }
}
