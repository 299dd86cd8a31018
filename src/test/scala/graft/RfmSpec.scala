package graft

import graft.operators.Rfm

class RfmSpec extends SparkSpec {
  import spark.implicits._

  private val Day = 86400000000L

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("hand quintiles: cume-based scores, R inverted, rfm fusion") {
    // u1: days {0, 10}, cents 300; u2: day 10, cents 50; u3: day 5,
    // cents 10000. now = day 10.
    val rows = Seq(
      (1L, 0L * Day, 1.0), (1L, 10L * Day, 2.0),
      (2L, 10L * Day, 0.5),
      (3L, 5L * Day, 100.0))
      .map { case (u, t, v) => (u, ts(t + 1000L), v) }
    val got = Rfm.segment(rows.toDF("user_id", "ts", "value"),
      "user_id", "ts", "value")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7)))).toMap
    // recency cume {0: 2/3 -> q4, 5: 3/3 -> q5}; freq {1 -> q4, 2 -> q5};
    // dollar bands {0 -> q2, 3 -> q4, 100 -> q5}
    assert(got(1L) == ((0L, 2L, 300L, 2L, 5L, 4L, 254L)), got.toString)
    assert(got(2L) == ((0L, 1L, 50L, 2L, 4L, 2L, 242L)))
    assert(got(3L) == ((5L, 1L, 10000L, 1L, 4L, 5L, 145L)))
  }

  test("null values count as zero spend, null users excluded") {
    val rows = Seq(
      (Some(1L), ts(1000L), Some(1.0)),
      (Some(1L), ts(2000L), None),
      (None, ts(3000L), Some(9.0)))
      .toDF("user_id", "ts", "value")
    val got = Rfm.segment(rows, "user_id", "ts", "value").collect()
    assert(got.length == 1)
    assert(got.head.getLong(2) == 2L && got.head.getLong(3) == 100L)
  }
}
