package graft

import graft.operators.Transitions

class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long, String, Long)]) =
    Transitions.matrix(
      rows.map { case (id, u, ty, t) => (id, u, ty, ts(t)) }
        .toDF("event_id", "user_id", "event_type", "ts"),
      "user_id", "ts", "event_id", "event_type")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

  test("hand-built journeys: counts and outgoing shares") {
    // user 1: a -> b -> a -> c   user 2: a -> b
    val got = run(Seq(
      (1L, 1L, "a", 1000000L), (2L, 1L, "b", 2000000L),
      (3L, 1L, "a", 3000000L), (4L, 1L, "c", 4000000L),
      (5L, 2L, "a", 1000000L), (6L, 2L, "b", 2000000L)))
    // from a: a->b twice, a->c once; from b: b->a once
    assert(got == Map(
      ("a", "b") -> (2L, 6666L),
      ("a", "c") -> (1L, 3333L),
      ("b", "a") -> (1L, 10000L)), got.toString)
  }

  test("timestamp ties break on event_id; users never cross") {
    val got = run(Seq(
      (1L, 1L, "a", 1000000L), (2L, 1L, "b", 1000000L), // tie: id order
      (9L, 2L, "c", 500000L))) // lone event of another user: no pair
    assert(got == Map(("a", "b") -> (1L, 10000L)), got.toString)
  }

  test("null user/type/ts rows are excluded") {
    val df = Seq(
      (1L, Some(1L), Some("a"), Some(ts(1000000L))),
      (2L, Some(1L), Some("b"), Some(ts(2000000L))),
      (3L, None: Option[Long], Some("c"), Some(ts(3000000L))),
      (4L, Some(1L), None: Option[String], Some(ts(4000000L))),
      (5L, Some(1L), Some("d"), None: Option[java.sql.Timestamp]))
      .toDF("event_id", "user_id", "event_type", "ts")
    val got = Transitions.matrix(df, "user_id", "ts", "event_id",
      "event_type").collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")), got.mkString(","))
  }

  test("streaming chain == batch matrix across triggers on real events " +
    "(state carries the boundary pair)") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_trans_src").toString
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .persist()
    // split by event-time median so per-user arrival order across the
    // two trigger files matches event-time order (the q88 contract);
    // pairs STRADDLING the split exist iff state carries across triggers
    val mid = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
    ev.filter(col("ts_us") <= mid).coalesce(1).write.parquet(s"$tmp/f1")
    ev.filter(col("ts_us") > mid).coalesce(1).write.parquet(s"$tmp/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/*")
    val drained = graft.streaming.ScoringStream.runToMemory(spark,
      Transitions.pairsStream(spark, stream), "append")
    val got = Transitions.rollup(drained).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = Transitions.matrix(
      ev.withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(col("ts_us"))),
      "user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == want,
      s"stream=${got.size} batch=${want.size} " +
        s"diff=${(want.toSet -- got.toSet).take(3)}")
    ev.unpersist()
  }

  test("the window partitions by user (no global sort of the stream)") {
    val df = Transitions.matrix(
      Seq((1L, 1L, "a", ts(0L))).toDF("event_id", "user_id", "event_type", "ts"),
      "user_id", "ts", "event_id", "event_type")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(__u"), p)
    assertNoCartesian(df)
  }
}
