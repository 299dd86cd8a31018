package graft

import graft.operators.Attribution

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // 1 h in µs

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long, String, Long)],
                  windowUs: Long = H) =
    Attribution.lastTouch(
      rows.map { case (id, u, ty, t) => (id, u, ty, ts(t)) }
        .toDF("event_id", "user_id", "event_type", "ts"),
      "user_id", "ts", "event_id", "event_type",
      "purchase", "click", windowUs)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        r.getLong(5))).toMap

  test("latest in-window click wins; out-of-window and missing stay null") {
    val got = run(Seq(
      (1L, 1L, "click", 1000000L),
      (2L, 1L, "click", 5000000L),          // latest preceding
      (3L, 1L, "purchase", 6000000L),       // attributed to 2
      (4L, 2L, "click", 0L),
      (5L, 2L, "purchase", 2L * H),         // click too old: unattributed
      (6L, 3L, "purchase", 1000000L)))      // no click at all
    assert(got(3L) == (Some(2L), Some(1000000L), 1L), got.toString)
    assert(got(5L) == (None, None, 0L))
    assert(got(6L) == (None, None, 0L))
  }

  test("a click at the purchase's exact microsecond matches (inclusive)") {
    val got = run(Seq(
      (1L, 1L, "click", 5000000L),
      (2L, 1L, "purchase", 5000000L)))
    assert(got(2L) == (Some(1L), Some(0L), 1L), got.toString)
  }

  test("same-µs clicks dedup to the max event id (deterministic pick)") {
    val got = run(Seq(
      (1L, 1L, "click", 5000000L),
      (7L, 1L, "click", 5000000L),
      (9L, 1L, "purchase", 6000000L)))
    assert(got(9L)._1 == Some(7L), got.toString)
  }

  test("clicks of another user never attribute") {
    val got = run(Seq(
      (1L, 2L, "click", 5000000L),
      (2L, 1L, "purchase", 6000000L)))
    assert(got(2L) == (None, None, 0L), got.toString)
  }

  test("streaming attribution == batch across triggers on real events " +
    "(state carries the last touch over the boundary)") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_attr_src").toString
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .persist()
    val mid = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
    ev.filter(col("ts_us") <= mid).coalesce(1).write.parquet(s"$tmp/f1")
    ev.filter(col("ts_us") > mid).coalesce(1).write.parquet(s"$tmp/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/*")
    val drained = graft.streaming.ScoringStream.runToMemory(spark,
      Attribution.lastTouchStream(spark, stream,
        "purchase", "click", H), "append")
    val batch = Attribution.lastTouch(
      ev.withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(col("ts_us"))),
      "user_id", "ts", "event_id", "event_type", "purchase", "click", H)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("conversion_id", "touch_id", "attributed").collect()
        .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2))).toSet
    val (o, b) = (key(drained), key(batch))
    assert(o == b, s"stream=${o.size} batch=${b.size} " +
      s"missing=${(b -- o).take(3)} extra=${(o -- b).take(3)}")
    ev.unpersist()
  }

  test("plan: union-tag as-of machinery, no per-user theta join") {
    val df = Attribution.lastTouch(
      Seq((1L, 1L, "click", ts(0L)), (2L, 1L, "purchase", ts(1000L)))
        .toDF("event_id", "user_id", "event_type", "ts"),
      "user_id", "ts", "event_id", "event_type", "purchase", "click", H)
    assertNoCartesian(df)
  }

  private def runPos(rows: Seq[(Long, Long, String, Long)],
                     windowUs: Long = H) =
    Attribution.positionCredit(
      rows.map { case (id, u, ty, t) => (id, u, ty, ts(t)) }
        .toDF("event_id", "user_id", "event_type", "ts"),
      "user_id", "ts", "event_id", "event_type",
      "purchase", "click", windowUs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getInt(3), r.getLong(4), r.getLong(5)))).toMap

  test("positionCredit: 40/20/40 with the remainder on the first touch; " +
    "credits sum to 10000") {
    // five clicks then a purchase: n=5, interiors get 2000 div 3 = 666,
    // first 4000 + 2000 % 3 = 4002, last 4000 → 4002+666+666+666+4000
    val clicks = (1L to 5L).map(i => (i, 1L, "click", i * 1000L))
    val got = runPos(clicks :+ ((9L, 1L, "purchase", 6000L)))
    assert(got((9L, 1L)) == ((1, 5L, 4002L)), got.toString)
    assert(got((9L, 2L)) == ((2, 5L, 666L)))
    assert(got((9L, 4L)) == ((4, 5L, 666L)))
    assert(got((9L, 5L)) == ((5, 5L, 4000L)))
    assert(got.filter(_._1._1 == 9L).values.map(_._3).sum == 10000L)
  }

  test("positionCredit: n=1 takes all, n=2 splits evenly, out-of-window " +
    "touches are excluded from n") {
    val got = runPos(Seq(
      (1L, 1L, "click", 1000L), (9L, 1L, "purchase", 2000L),
      (2L, 2L, "click", 1000L), (3L, 2L, "click", 2000L),
      (8L, 2L, "purchase", 3000L),
      (4L, 3L, "click", 0L),                    // out of window for 7
      (5L, 3L, "click", 2 * H),
      (7L, 3L, "purchase", 2 * H + H)))
    assert(got((9L, 1L)) == ((1, 1L, 10000L)), got.toString)
    assert(got((8L, 2L)) == ((1, 2L, 5000L)))
    assert(got((8L, 3L)) == ((2, 2L, 5000L)))
    assert(got((7L, 5L)) == ((1, 1L, 10000L)))
    assert(!got.contains((7L, 4L)))
  }
}
