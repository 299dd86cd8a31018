package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val H = 3600L * 1000000L // 1h in µs

  test("points match exactly the intervals containing them (inclusive ends)") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "w1"),
      (1L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00"), "w2"), // overlaps w1
      (2L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"), "w3")
    ).toDF("k", "start_ts", "end_ts", "wid")
    val points = Seq(
      (1L, ts("2024-01-01 10:45:00"), "p1"), // in w1 AND w2
      (1L, ts("2024-01-01 11:00:00"), "p2"), // end of w1 (inclusive), in w2
      (1L, ts("2024-01-01 12:00:00"), "p3"), // in nothing
      (2L, ts("2024-01-01 10:30:00"), "p4"), // in w3 (not w1/w2: wrong key)
      (3L, ts("2024-01-01 10:30:00"), "p5")  // key with no intervals
    ).toDF("k", "pts", "pid")

    val out = RangeJoin.rangeJoin(points, intervals, "k", "k", "pts",
        "start_ts", "end_ts", bucketWidthUs = H, Seq("wid"))
      .collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(out == Set(("p1", "w1"), ("p1", "w2"), ("p2", "w1"), ("p2", "w2"),
      ("p4", "w3")))
  }

  test("oversized interval fails fast instead of silently missing matches") {
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00"), "big")
    ).toDF("k", "start_ts", "end_ts", "wid")
    val points = Seq((1L, ts("2024-01-01 12:30:00"), "p")).toDF("k", "pts", "pid")
    val ex = intercept[Exception] {
      RangeJoin.rangeJoin(points, intervals, "k", "k", "pts",
        "start_ts", "end_ts", bucketWidthUs = H, Seq("wid")).collect()
    }
    assert(ex.getMessage != null)
  }

  test("plan is an equi-join on (key, bucket), never a nested loop") {
    val intervals = Seq((1L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:30:00"), "w")).toDF("k", "start_ts", "end_ts", "wid")
    val points = Seq((1L, ts("2024-01-01 10:15:00"), "p")).toDF("k", "pts", "pid")
    assertNoCartesian(RangeJoin.rangeJoin(points, intervals, "k", "k", "pts",
      "start_ts", "end_ts", bucketWidthUs = H, Seq("wid")))
  }
}
