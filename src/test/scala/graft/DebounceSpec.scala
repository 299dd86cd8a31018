package graft

import org.apache.spark.sql.functions._

import graft.operators.Debounce

class DebounceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long)], cooldown: Long) =
    Debounce.debounce(
      rows.toDF("user_id", "event_type", "ts_us", "event_id"),
      Seq("user_id", "event_type"), "ts_us", "event_id", cooldown)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet

  test("kept-chain semantics: survival depends on prior survivors, not lag") {
    // ts 0, 5, 9, 10 with cooldown 10: keep 0; 5 and 9 are within 10 of
    // kept 0; 10 is exactly 10 after -> kept. A lag()-based filter would
    // (wrongly) also drop 10 because its lag-gap to 9 is 1.
    val out = run(Seq(
      (1L, "a", 0L, 100L), (1L, "a", 5L, 101L),
      (1L, "a", 9L, 102L), (1L, "a", 10L, 103L)), cooldown = 10L)
    assert(out.map(_._4) == Set(100L, 103L))
  }

  test("chains are independent per (user, type) key") {
    val out = run(Seq(
      (1L, "a", 0L, 1L), (1L, "a", 3L, 2L),
      (1L, "b", 1L, 3L), (2L, "a", 2L, 4L)), cooldown = 100L)
    // each key's first event survives; user 1's second "a" does not
    assert(out.map(_._4) == Set(1L, 3L, 4L))
  }

  test("equal timestamps: tie-broken by id, later duplicates dropped") {
    val out = run(Seq(
      (1L, "a", 7L, 20L), (1L, "a", 7L, 10L), (1L, "a", 7L, 30L)),
      cooldown = 1L)
    assert(out.map(_._4) == Set(10L)) // lowest id wins the tie
  }

  test("matches a local sequential replay on real events") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
    val cd = 172800000000L // 48 h
    val got = Debounce.debounce(ev, Seq("user_id", "event_type"), "ts_us",
      "event_id", cd).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    val local = ev.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(e => (e._1, e._2)).values.flatMap { g =>
        var last = Long.MinValue
        g.sortBy(e => (e._3, e._4)).filter { e =>
          if (last == Long.MinValue || e._3 - last >= cd) { last = e._3; true }
          else false
        }
      }.toSet
    assert(got == local && got.size < ev.count())
  }

  test("partitioning-invariant: the kept set is a function of the data") {
    val rows = (1 to 500).map { i =>
      ((i % 7).toLong, s"t${i % 3}", (i * 13 % 101).toLong, i.toLong)
    }
    val df = rows.toDF("user_id", "event_type", "ts_us", "event_id")
    def kept(parts: Int) = Debounce.debounce(df.repartition(parts),
      Seq("user_id", "event_type"), "ts_us", "event_id", 25L)
      .collect().map(_.getLong(3)).toSet
    assert(kept(1) == kept(32))
  }

  test("plan: one key-hash exchange, a partition sort, no Window") {
    val df = (1 to 50).map(i => (i.toLong % 5, "a", i.toLong, i.toLong))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val p = Debounce.debounce(df, Seq("user_id", "event_type"), "ts_us",
      "event_id", 10L).queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(user_id"), s"no key exchange:\n$p")
    assert(!p.contains("Window"), s"window crept in:\n$p")
    assert(!p.contains("Exchange rangepartitioning"), s"global sort:\n$p")
  }

  test("non-long ts column is rejected at plan time, not per row") {
    val df = Seq((1L, "a", 5, 7L))
      .toDF("user_id", "event_type", "ts_s", "event_id")
    val e = intercept[IllegalArgumentException] {
      Debounce.debounce(df, Seq("user_id"), "ts_s", "event_id", 10L)
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("streaming twin continues the chain across triggers") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_deb_src").toString
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .persist()
    val cd = 172800000000L
    // split by event-time median so per-key arrival order across the two
    // files matches event-time order (the documented in-order contract)
    val mid = ev.stat.approxQuantile("ts_us", Array(0.5), 0.0).head.toLong
    ev.filter(col("ts_us") <= mid).write.parquet(s"$tmp/f1")
    ev.filter(col("ts_us") > mid).write.parquet(s"$tmp/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/*")
    val out = graft.streaming.ScoringStream.runToMemory(spark,
      Debounce.debounceStream(spark, stream, cd), "append")
    val batch = Debounce.debounce(ev, Seq("user_id", "event_type"), "ts_us",
      "event_id", cd)
    val o = out.select("event_id").collect().map(_.getLong(0)).toSet
    val b = batch.select("event_id").collect().map(_.getLong(0)).toSet
    assert(o == b, s"stream=${o.size} batch=${b.size} " +
      s"missing=${(b -- o).take(3)} extra=${(o -- b).take(3)}")
    ev.unpersist()
  }
}
