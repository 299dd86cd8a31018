package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    // A completes in order: depth 3
    (1L, "view", ts(10)), (1L, "click", ts(20)), (1L, "purchase", ts(30)),
    // B clicked only BEFORE the first view: depth 1 (contract, not bug)
    (2L, "click", ts(5)), (2L, "view", ts(10)),
    // C: purchase precedes the click: depth 2
    (3L, "view", ts(10)), (3L, "purchase", ts(15)), (3L, "click", ts(20)),
    // D never viewed: absent from the funnel
    (4L, "click", ts(10)), (4L, "purchase", ts(20)),
    // E: click at the SAME instant as view — strict order, no advance
    (5L, "view", ts(10)), (5L, "click", ts(10)),
    // F: two views; the EARLIEST anchors the chain, later click counts
    (6L, "view", ts(50)), (6L, "view", ts(10)), (6L, "click", ts(20))
  ).toDF("user_id", "event_type", "ts")

  test("funnel depths and chain timestamps follow the strict-order contract") {
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), r.getInt(4))))
      .toMap
    def us(s: Long) = s * 1000000L
    assert(out.keySet == Set(1L, 2L, 3L, 5L, 6L)) // D never entered
    assert(out(1L) == ((Some(us(10)), Some(us(20)), Some(us(30)), 3)))
    assert(out(2L) == ((Some(us(10)), None, None, 1)))
    assert(out(3L) == ((Some(us(10)), Some(us(20)), None, 2)))
    assert(out(5L) == ((Some(us(10)), None, None, 1)))
    assert(out(6L) == ((Some(us(10)), Some(us(20)), None, 2)))
  }

  test("single-step funnel degenerates to first-event-per-user") {
    val out = Funnel.funnel(events, "user_id", "event_type", "ts", Seq("view"))
    assert(out.columns.toSeq == Seq("user_id", "t1_us", "depth"))
    assert(out.filter(col("depth") =!= 1).count() == 0)
    assert(out.count() == 5) // users 1, 2, 3, 5, 6 viewed
  }

  test("funnel over the events table: monotone depth counts, sane plan") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val out = Funnel.funnel(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    assertNoCartesian(out)
    val byDepth = out.groupBy("depth").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every user that reached depth d+1 reached depth d: cumulative counts
    // are monotone non-increasing
    val cum = (1 to 3).map(d => (d to 3).map(x => byDepth.getOrElse(x, 0L)).sum)
    assert(cum == cum.sorted.reverse, s"non-monotone funnel: $byDepth")
    assert(cum.head > 0, "no user entered the funnel")
  }

  test("NULL users never enter the funnel as a phantom entrant") {
    val ts = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val events = Seq(
      (Some(1L), "view", ts),
      (Option.empty[Long], "view", ts),
      (Option.empty[Long], "view", ts)).toDF("user_id", "etype", "ts")
    val out = graft.operators.Funnel.funnel(
      events, "user_id", "etype", "ts", Seq("view", "buy"))
    assert(out.count() == 1 && !out.head().isNullAt(0),
      "a NULL-user phantom row entered the funnel")
  }
}
