package graft

import org.apache.spark.sql.functions._

import graft.operators.Retention

class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val week = 604800000000L

  private def ts(w: Long, off: Long = 0L) =
    new java.sql.Timestamp((w * week + off) / 1000)

  test("hand-built cohorts: offsets count returning users exactly; " +
    "repeat events within a week collapse") {
    val ev = Seq(
      ("a", ts(100)), ("a", ts(100, 5000000L)), // same week: one activity
      ("a", ts(101)), ("a", ts(103)),
      ("b", ts(100)), ("b", ts(101)),
      ("c", ts(101)))
      .toDF("user_id", "t")
    val got = Retention.cohortRetention(ev, "user_id", "t")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (100L, 0L) -> 2L,  // a, b start week 100
      (100L, 1L) -> 2L,  // both return week 101
      (100L, 3L) -> 1L,  // only a returns week 103
      (101L, 0L) -> 1L), // c starts week 101
      got.toString)
  }

  test("null users and timestamps are excluded; plan join-safe") {
    val ev = Seq(
      (Some("a"), Some(ts(7))), (None, Some(ts(7))), (Some("b"), None))
      .toDF("user_id", "t")
    val df = Retention.cohortRetention(ev, "user_id", "t")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((7L, 0L, 1L)))
    assertNoCartesian(df)
  }
}
