package graft

import graft.operators.GapProfile

class GapProfileSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  private def run(rows: Seq[(Long, Long, Long)]) =
    GapProfile.profile(
      rows.map { case (u, t, id) => (u, ts(t), id) }
        .toDF("user_id", "ts", "event_id"),
      "user_id", "ts", "event_id")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap

  test("constant-gap bot concentrates in one bucket and flags") {
    // user 1: gaps of exactly 1000 µs -> bucket floor(log2 1000) = 9
    val bot = (0 to 4).map(i => (1L, i * 1000L, i.toLong))
    val got = run(bot)
    assert(got(1L) == ((4L, 1L, 9L, 10000L, 1L)), got.toString)
  }

  test("spread gaps stay unflagged; dominant bucket is the modal one") {
    // ms-aligned times (Timestamp carries ms); gaps 1000/2000/4000/8000/
    // 8000 µs -> buckets 9, 10, 11, 12, 12 -> b12 share 2/5 = 4000
    val t = Seq(0L, 1000L, 3000L, 7000L, 15000L, 23000L)
    val human = t.zipWithIndex.map { case (x, i) => (1L, x, i.toLong) }
    val got = run(human)
    assert(got(1L) == ((5L, 4L, 12L, 4000L, 0L)), got.toString)
  }

  test("zero gaps (same-ts events) land in bucket 0; single-event users " +
    "don't appear") {
    val got = run(Seq((1L, 5000L, 1L), (1L, 5000L, 2L), (2L, 9000L, 3L)))
    assert(got(1L) == ((1L, 1L, 0L, 10000L, 1L)), got.toString)
    assert(!got.contains(2L))
  }

  test("streaming gap buckets == batch profile across triggers " +
    "(state carries the boundary gap)") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_gap_src").toString
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .persist()
    val mid = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
    ev.filter(col("ts_us") <= mid).coalesce(1).write.parquet(s"$tmp/f1")
    ev.filter(col("ts_us") > mid).coalesce(1).write.parquet(s"$tmp/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/*")
    val drained = graft.streaming.ScoringStream.runToMemory(spark,
      GapProfile.bucketsStream(spark, stream), "append")
    val got = GapProfile.profileFromBuckets(drained).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val want = GapProfile.profile(
      ev.withColumn("ts", org.apache.spark.sql.functions
        .timestamp_micros(col("ts_us"))),
      "user_id", "ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want,
      s"stream=${got.size} batch=${want.size} diff=${(want -- got).take(3)}")
    ev.unpersist()
  }

  test("bucket tie-break: equal counts pick the smaller bucket") {
    // gaps 1000 (b9), 2000 (b10) -> both count 1, winner b9 at 5000 bp
    val got = run(Seq((1L, 0L, 1L), (1L, 1000L, 2L), (1L, 3000L, 3L)))
    assert(got(1L) == ((2L, 2L, 9L, 5000L, 0L)), got.toString)
  }
}
