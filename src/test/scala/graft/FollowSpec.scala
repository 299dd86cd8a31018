package graft

import graft.operators.Follow

class FollowSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long, Long, String)],
                  windowUs: Long = 30 * M) =
    Follow.followMatrix(
      rows.map { case (id, u, t, ty) => (id, u, ts(t), ty) }
        .toDF("event_id", "user_id", "ts", "event_type"),
      "user_id", "ts", "event_id", "event_type", windowUs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("indicator per A event (multiple Bs count once); same-type " +
    "follows are rows; out-of-window A has no row impact") {
    val got = run(Seq(
      (1L, 1L, 0L, "A"), (2L, 1L, 10 * M, "B"), (3L, 1L, 20 * M, "B"),
      (4L, 1L, 100 * M, "A")))
    // A@0 followed by both Bs → counts ONCE; A@100 unfollowed
    assert(got((("A", "B"))) == ((2L, 1L, 5000L)), got.toString)
    // B@10 followed by B@20
    assert(got((("B", "B"))) == ((2L, 1L, 5000L)))
    assert(!got.contains(("B", "A")))
  }

  test("cross-user events never follow; same-instant events never " +
    "follow (strict >)") {
    val got = run(Seq(
      (1L, 1L, 0L, "A"), (2L, 2L, 5 * M, "B"),  // other user's B
      (3L, 3L, 0L, "A"), (4L, 3L, 0L, "C")))    // same instant
    assert(got.isEmpty, got.toString)
  }

  test("window boundary is inclusive at exactly Δt") {
    val got = run(Seq((1L, 1L, 0L, "A"), (2L, 1L, 30 * M, "B")))
    assert(got((("A", "B"))) == ((1L, 1L, 10000L)), got.toString)
    // +1 full minute: Timestamp is ms-grained, a +1 us would vanish
    val none = run(Seq((1L, 1L, 0L, "A"), (2L, 1L, 31 * M, "B")))
    assert(none.isEmpty, none.toString)
  }
}
