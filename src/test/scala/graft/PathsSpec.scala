package graft

import graft.operators.Paths

class PathsSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in µs

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long, Long, String)], maxSteps: Int = 8,
                  k: Int = 20) =
    Paths.topSessionPaths(
      rows.map { case (u, t, id, ty) => (u, ts(t), id, ty) }
        .toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type",
      gapMinutes = 60, maxSteps = maxSteps, k = k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("sessions split at the gap; identical paths count together; " +
    "order is (n desc, path asc)") {
    val got = run(Seq(
      (1L, 0L, 1L, "view"), (1L, 10 * M, 2L, "click"),
      (1L, 200 * M, 3L, "view"),              // new session after the gap
      (2L, 0L, 4L, "view"), (2L, 5 * M, 5L, "click")))
    assert(got == Seq(("view>click", 2L), ("view", 1L)), got.toString)
  }

  test("paths cap at maxSteps; same-µs events order by the tie column") {
    val long = (1 to 10).map(i => (1L, i * M, i.toLong, s"e$i"))
    val tied = Seq((2L, 0L, 21L, "b"), (2L, 0L, 20L, "a"))
    val got = run(long ++ tied, maxSteps = 3).toMap
    assert(got.contains("e1>e2>e3"), got.toString)
    assert(got.contains("a>b"), got.toString)
    assert(!got.keys.exists(_.contains("e4")))
  }

  test("k cuts on the deterministic total order") {
    val rows = Seq(
      (1L, 0L, 1L, "a"), (2L, 0L, 2L, "b"), (3L, 0L, 3L, "c"))
    val got = run(rows, k = 2)
    // all counts 1 → lexicographic: a, b
    assert(got == Seq(("a", 1L), ("b", 1L)), got.toString)
  }

  test("plan: top-k is TakeOrdered, not a global sort exchange") {
    // more paths than k so EliminateLimits cannot drop the cut
    val rows = (1 to 40).map(i => (i.toLong, ts(0L), i.toLong, s"e${i % 9}"))
    val df = Paths.topSessionPaths(
      rows.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", k = 3)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), s"global sort planned:\n$p")
  }
}
