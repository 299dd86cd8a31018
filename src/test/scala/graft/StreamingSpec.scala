package graft

import org.apache.spark.sql.functions._

import graft.ml.Sentiment
import graft.sources.Tables
import graft.streaming.{ScoringStream, Sessionize}

class StreamingSpec extends SparkSpec {

  test("windowedAgg over the events stream equals the batch equivalent") {
    val streamed = ScoringStream.runToMemory(spark,
      ScoringStream.windowedAgg(
        ScoringStream.eventsStream(spark, s"$sfDir/events.parquet")),
      "complete")
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("total_c"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_c"))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getString(1))
    val s = streamed.collect().map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    val b = batch.collect().map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    assert(s == b, s"stream=${s.size} batch=${b.size}")
  }

  test("scoreStream scores every event exactly once with a model loaded once") {
    val docs = Sentiment.prepare(Tables.documents(spark, sfDir))
    val (model, _, _) = Sentiment.trainEval(docs, "svm", seed = 100L,
      vocabSize = 128)
    // stream documents' text through the scoring pipeline via a memory-backed
    // parquet dir (events carry no text column; documents stand in)
    val tmp = java.nio.file.Files.createTempDirectory("graft_score_src").toString
    Tables.documents(spark, sfDir).select("doc_id", "text", "n_chars")
      .write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema).parquet(tmp)
    val scored = ScoringStream.scoreStream(stream, model, "text")
      .select("doc_id", "sentiment")
    val out = ScoringStream.runToMemory(spark, scored, "append")
    assert(out.count() == 500)
    val labels = out.select("sentiment").distinct()
      .collect().map(_.getString(0)).toSet
    assert(labels.subsetOf(Set("Positive", "Negative")))
  }

  test("dedupStream drops within-watermark duplicates exactly") {
    // stage the same events file twice -> every event_id arrives twice
    val src = java.nio.file.Files.createTempDirectory("graft_dedup_src").toString
    val events = Tables.events(spark, sfDir).select("event_id", "ts", "value")
    events.write.parquet(s"$src/f1")
    events.write.parquet(s"$src/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$src/f1").schema).parquet(s"$src/*")
    val out = ScoringStream.runToMemory(spark,
      ScoringStream.dedupStream(stream, Seq("event_id"), "ts", "1 hour"),
      "append")
    assert(out.count() == 1000, s"expected 1000 unique events, got ${out.count()}")
    assert(out.select("event_id").distinct().count() == 1000)
  }

  test("streaming minhash near-dup suppresses cross-batch near-duplicates") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh_src").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def T(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // batch 1: two distinct docs; batch 2: an exact dup of doc 1, a strong
    // near-dup of doc 2 (one appended token), and one genuinely new doc;
    // batch 3: a far-future sentinel that advances the watermark so every
    // emit window finalizes before the AvailableNow stream ends
    val b1 = Seq(
      (1L, T(0), "the quick brown fox jumps over the lazy dog again and again"),
      (2L, T(1), "spark catalyst optimizer rewrites logical plans into physical plans")
    ).toDF("id", "ts", "text")
    val b2 = Seq(
      (3L, T(5), "the quick brown fox jumps over the lazy dog again and again"),
      (4L, T(6), "spark catalyst optimizer rewrites logical plans into physical plans today"),
      (5L, T(7), "completely new content about streaming watermarks and state stores here")
    ).toDF("id", "ts", "text")
    val b3 = Seq((99L, T(48 * 60), "sentinel row advancing the watermark far ahead now"))
      .toDF("id", "ts", "text")
    b1.write.parquet(s"$tmp/f1")
    b2.write.parquet(s"$tmp/f2")
    b3.write.parquet(s"$tmp/f3")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/*")
    val out = ScoringStream.runToMemory(spark,
      ScoringStream.dedupStreamMinHash(stream, "id", "text", "ts",
        watermark = "2 hours", emitWindow = "10 minutes"),
      "append")
    val kept = out.filter(col("id") =!= 99L)
      .select("id").as[Long].collect().toSet
    // 3 (exact dup) collides in every band; 4 (near-dup, J=10/11) collides
    // in at least one band under the fixed hash family; 5 is new
    assert(kept == Set(1L, 2L, 5L), s"kept $kept")
  }

  test("stream-stream interval join matches labels within the delay bound only") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_ssj").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def T(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // events k1@0, k2@0; labels: k1@+5 (inside 10-min delay), k2@+30
    // (outside), k1@-5 (before the event — must not match), plus a
    // watermark-advancing sentinel on each side
    val events = Seq((1L, T(0), "e1"), (2L, T(0), "e2"),
      (999L, T(48 * 60), "s")).toDF("k", "ts", "payload")
    val labels = Seq((1L, T(5), "good"), (2L, T(30), "late"),
      (1L, T(-5), "early"), (999L, T(48 * 60), "s"))
      .toDF("k", "lts", "label")
    events.write.parquet(s"$tmp/e")
    labels.write.parquet(s"$tmp/l")
    def rd(p: String) = spark.readStream
      .schema(spark.read.parquet(p).schema).parquet(p)
    val joined = ScoringStream.joinStreams(rd(s"$tmp/e"), rd(s"$tmp/l"),
      "k", "ts", "lts", watermark = "1 hour", maxDelay = "10 MINUTES")
    val out = ScoringStream.runToMemory(spark, joined, "append")
      .filter(col("k") =!= 999L)
      .select("k", "label").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "good")), s"got $out")
  }

  test("deterministic sampling composes with streams (stateless filter)") {
    import graft.operators.Sampling
    val events = ScoringStream.eventsStream(spark, s"$sfDir/events.parquet")
    val sampled = Sampling.stratifiedSample(events, "event_type",
      Map("click" -> 0), defaultBp = 10000,
      bp = Sampling.hashBp(col("event_id")))
    val got = ScoringStream.runToMemory(spark, sampled, "append")
    // batch equivalent over the same file — identical rows (determinism is
    // exactly what df.sample() can NOT promise under streaming retries)
    val batch = Sampling.stratifiedSample(
      graft.sources.Tables.events(spark, sfDir), "event_type",
      Map("click" -> 0), defaultBp = 10000,
      bp = Sampling.hashBp(col("event_id")))
    assert(got.count() > 0)
    assert(got.select("event_id").collect().map(_.getLong(0)).toSet ==
      batch.select("event_id").collect().map(_.getLong(0)).toSet)
  }

  test("streaming DSIR scoring under a frozen model equals batch exactly, " +
    "whatever the microbatch boundaries") {
    import graft.textstats.Dsir
    val docs = Tables.documents(spark, sfDir)
    val delta = Dsir.model(docs, "doc_id", "text",
        col("source").isin("src0", "src1"), buckets = 1024)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dir = java.nio.file.Files.createTempDirectory("dsir_stream").toString
    docs.select("doc_id", "text").repartition(5)
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = ScoringStream.runToMemory(spark,
        Dsir.score(stream, "doc_id", "text", delta, buckets = 1024),
        "complete", Some(4))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = Dsir.score(docs, "doc_id", "text", delta, buckets = 1024)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == batch && got.nonEmpty, s"stream=${got.size} batch=${batch.size}")
    delta.unpersist()
  }

  test("streaming record linkage against a static master index equals " +
    "the batch linkage (stateless row predicate)") {
    import org.apache.spark.sql.functions.expr
    import graft.operators.RecordLinkage
    val rec = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        expr("substring(text, 1, 24)").as("rec"))
    def shaped(df: org.apache.spark.sql.DataFrame) =
      RecordLinkage.shape(df, "doc_id", expr("substring(rec, 1, 4)"), "rec")
    val masters = shaped(rec.filter(expr("doc_id % 10 <> 9")))
    val probeSrc = rec.filter(expr("doc_id % 10 = 9"))
    val dir = java.nio.file.Files.createTempDirectory("linkstream").toString
    probeSrc.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val got = ScoringStream.runToMemory(spark,
        RecordLinkage.linkBlocked(shaped(stream), masters, maxDist = 1),
        "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = RecordLinkage.linkBlocked(shaped(probeSrc), masters, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == batch && got.nonEmpty)
  }

  test("streaming rate monitor: cross-batch hour cells sum, retry " +
    "partials collapse, and the rollup equals the batch screen") {
    import org.apache.spark.sql.functions.{col, date_trunc, count, lit}
    import graft.operators.Robust
    val ev = Tables.events(spark, sfDir).select("event_id", "event_type", "ts")
    val tmp = java.nio.file.Files.createTempDirectory("ratemon").toString
    // repartition splits rows of the same hour across files → batches
    ev.repartition(4).write.mode("overwrite").parquet(s"$tmp/src")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src")
    ScoringStream.monitorRateStream(stream, "event_type", "ts",
      s"$tmp/mon", s"$tmp/ckpt")
    // simulate an at-least-once retry of batch 0
    val mon = spark.read.parquet(s"$tmp/mon")
    mon.filter(col("batch_id") === 0L).write.mode("append")
      .parquet(s"$tmp/mon")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "hour", "c", "median", "mad", "spike")
        .collect().map(r => (r.getString(0), r.get(1).toString) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val got = key(ScoringStream.readRateMonitor(spark, s"$tmp/mon"))
    val hourly = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("c"))
    val batch = key(Robust.rateSpikes(hourly, "event_type", "c", 3))
    assert(got == batch && got.nonEmpty)
  }

  test("socket source feeds the same cleaning pipeline (reference ingress)") {
    val server = new java.net.ServerSocket(0)
    val feeder = new Thread(() => {
      val sock = server.accept() // the streaming query connects
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      Seq("Great product!! 10/10", "terrible, awful thing...").foreach(out.println)
      out.flush() // keep the socket open until the query stops
      Thread.sleep(30000)
      sock.close()
    })
    feeder.setDaemon(true)
    feeder.start()
    val cleaned = ScoringStream
      .socketLines(spark, "localhost", server.getLocalPort)
      .select(graft.functions.TextFunctions.cleanText(col("line")).as("text"))
    val q = cleaned.writeStream.format("memory").queryName("sock_t")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("sock_t").count() < 2 &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      assert(spark.table("sock_t").collect().map(_.getString(0)).toSet ==
        Set("Great product", "terrible awful thing"))
    } finally {
      q.stop()
      server.close()
    }
  }

  test("runToParquet appends with exactly-once checkpointing") {
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    // stable source dir: the checkpoint's file-source log is keyed by path
    Tables.events(spark, sfDir).select("event_id", "event_type", "value")
      .write.parquet(s"$base/src")
    def stream() = spark.readStream
      .schema(spark.read.parquet(s"$base/src").schema).parquet(s"$base/src")
    ScoringStream.runToParquet(stream(), s"$base/out", s"$base/ckpt")
    val n1 = spark.read.parquet(s"$base/out").count()
    assert(n1 == 1000)
    // restart with the same checkpoint: nothing new -> nothing re-emitted
    ScoringStream.runToParquet(stream(), s"$base/out", s"$base/ckpt")
    assert(spark.read.parquet(s"$base/out").count() == n1)
  }

  test("streaming signature commit: index == batch sigs, exactly-once, probeable") {
    import spark.implicits._
    import graft.dedup.SimHash
    val base = java.nio.file.Files.createTempDirectory("graft_sigcommit").toString
    val d1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "spark catalyst optimizer rewrites logical plans into physical plans"))
      .toDF("id", "text")
    val d2 = Seq(
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely new content about streaming watermarks and state stores"))
      .toDF("id", "text")
    d1.write.parquet(s"$base/src/f1")
    def stream() = spark.readStream
      .schema(spark.read.parquet(s"$base/src/f1").schema)
      .parquet(s"$base/src/*")
    def commit() = ScoringStream.commitSignaturesStream(
      stream(), "id", "text", s"$base/idx", s"$base/ckpt")
    def idx() = spark.read.parquet(s"$base/idx")
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "simhash").as[(Long, Long)].collect().toSet

    // day 1: stream-committed index == batch signatures, bit for bit
    commit()
    assert(asSet(idx()) == asSet(SimHash.signatures(d1, "id", "text")))
    // restart with the same checkpoint and nothing new: no re-append
    commit()
    assert(idx().count() == 2)
    // the committed index is probeable BEFORE day 2 lands: the day-2
    // exact copy (id 3) hits day-1's id 1; the new doc (id 4) hits nothing
    val hits = SimHash.nearDuplicatesAgainstIndex(idx(),
      SimHash.signatures(d2, "id", "text"), maxHamming = 3)
    assert(hits.select("new_id", "dup_id").as[(Long, Long)].collect().toSet
      == Set((3L, 1L)), "exact copy must hit its day-1 original")
    // day 2 arrives: the same checkpoint drains ONLY the increment and
    // the index now equals batch signatures of both days
    d2.write.parquet(s"$base/src/f2")
    commit()
    assert(asSet(idx()) ==
      asSet(SimHash.signatures(d1.unionByName(d2), "id", "text")))
    assertNoCartesian(hits)
  }

  test("streaming OOV monitor rollup == batch audit; retry partials collapse") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("graft_oovmon").toString
    docs.repartition(3).write.mode("overwrite").parquet(s"$tmp/src")
    val vocab = graft.textstats.VocabCoverage.topVocab(docs, "text", "source", 50)
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/src")
    ScoringStream.monitorOovStream(stream, "text", "source", vocab,
      s"$tmp/mon", s"$tmp/ckpt")
    // multiple microbatches actually happened (partial rows carry ids)
    val batches = spark.read.parquet(s"$tmp/mon")
      .select("batch_id").distinct().count()
    assert(batches >= 2, s"expected a multi-batch drain, got $batches")
    def roll() = ScoringStream.readOovMonitor(spark, s"$tmp/mon")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val streamed = roll()
    val batch = graft.textstats.VocabCoverage
      .oovReport(docs, "text", "source", 50)
      .select("source", "tokens", "oov_tokens", "oov_bp")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(streamed == batch,
      s"rollup must equal the batch audit: ${streamed.size}/${batch.size}")
    // simulate a foreachBatch retry: re-append one batch's partials
    // verbatim — the (batch_id, source) collapse must absorb them
    val partials = spark.read.parquet(s"$tmp/mon")
    partials.filter(col("batch_id") === 0L)
      .write.mode("append").parquet(s"$tmp/mon")
    assert(roll() == batch, "duplicated retry partials changed the rollup")
  }

  test("native session_window matches a hand-built lag/cumsum sessionization") {
    val events = Tables.events(spark, sfDir)
    val native = Sessionize.sessionWindows(events, "1 hour")
    // lag/cumsum reference, computed with Spark window functions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val ref = events
      .withColumn("new_s",
        when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
          < 3600L * 1000000L, lit(0)).otherwise(lit(1)))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "sid")
      .agg(unix_micros(min(col("ts"))).as("session_start_us"),
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select("user_id", "session_start_us", "n_events", "value_c")
    val n = native.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val e = ref.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(n == e, s"native=${n.size} ref=${e.size}")
  }

  test("stateful flatMapGroupsWithState sessionization matches session_window") {
    // two source files: the real events, then a far-future sentinel that
    // advances the watermark past every session's timeout so all sessions
    // flush before the AvailableNow stream ends
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess_src").toString
    val events = Tables.events(spark, sfDir).select("user_id", "ts", "value")
    events.write.mode("overwrite").parquet(s"$tmp/f1")
    events.limit(1)
      .withColumn("ts", col("ts") + expr("INTERVAL 365 DAYS"))
      .withColumn("user_id", lit(-1L))
      .write.mode("overwrite").parquet(s"$tmp/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/*")
    val out = ScoringStream.runToMemory(spark,
      Sessionize.sessionizeStateful(spark, stream, gapMinutes = 60).toDF(),
      "append")
      .filter(col("user_id") =!= -1L)
    val expect = Sessionize.sessionWindows(Tables.events(spark, sfDir), "1 hour")
    val o = out.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val x = expect.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(o == x, s"stateful=${o.size} native=${x.size} " +
      s"missing=${(x.keySet -- o.keySet).take(3)} extra=${(o.keySet -- x.keySet).take(3)}")
  }

  test("partial sub-sessions gap-merge to the batch sessions for an " +
    "adversarial split (envelope case) and under retry duplicates") {
    import spark.implicits._
    def ev(rows: Seq[(Long, Long, Double)]) =
      rows.toDF("user_id", "us", "value")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
          col("value"))
    val m = 60L * 1000000L // one minute in µs
    // batch A chains 0..150 min; batch B sits INSIDE A's span; batch C's
    // event at 200 min is within gap of A's last (150) but NOT of B's
    // last (20) — a lag(last) merge would wrongly split, the running-max
    // merge must not
    val a = ev(Seq((1L, 0L, 1.0), (1L, 50 * m, 1.0), (1L, 100 * m, 1.0),
      (1L, 150 * m, 1.0)))
    val b = ev(Seq((1L, 10 * m, 1.0), (1L, 20 * m, 1.0)))
    val c = ev(Seq((1L, 200 * m, 1.0)))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sessmon").toString
    Seq((a, 0L), (b, 1L), (c, 2L), (b, 1L)).foreach { case (df, id) =>
      // the second (b, 1L) append simulates a foreachBatch retry
      Sessionize.subSessions(df, 60).withColumn("batch_id", lit(id))
        .write.mode("append").parquet(tmp)
    }
    val got = ScoringStream.readSessionMonitor(spark, tmp, 60)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // one session: start 0, 7 events, 700 cents
    assert(got == Set((1L, 0L, 7L, 700L)), got.toString)
  }

  test("partial sub-sessions merge equals sessionWindows on the real " +
    "events table for an arbitrary 3-way split") {
    // split by a hash of the EVENT (not the user): a user's session is
    // smeared across all three batches — the hard case for the merge
    val events = Tables.events(spark, sfDir).select("user_id", "ts", "value")
      .withColumn("__p", pmod(hash(col("ts"), col("value")), lit(3)))
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sessmon3").toString
    (0 until 3).foreach { i =>
      Sessionize.subSessions(
          events.filter(col("__p") === i).drop("__p"), 60)
        .withColumn("batch_id", lit(i.toLong))
        .write.mode("append").parquet(tmp)
    }
    val got = ScoringStream.readSessionMonitor(spark, tmp, 60)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val want = Sessionize.sessionWindows(
        Tables.events(spark, sfDir).select("user_id", "ts", "value"),
        "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"merged=${got.size} batch=${want.size}")
  }

  test("mergeStream: generations fold to the batch apply; a restart with " +
    "the same checkpoint is a no-op") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_mstream").toString
    val base = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "n")
    base.write.mode("overwrite").parquet(s"$tmp/base")
    val changes = Seq(
      (2L, "delete", 0L), (3L, "update", 99L), (7L, "insert", 70L))
      .toDF("id", "op", "n")
    changes.repartition(3).write.mode("overwrite").parquet(s"$tmp/feed")
    def drain(): Unit = graft.streaming.ScoringStream.mergeStream(
      spark.readStream.schema(spark.read.parquet(s"$tmp/feed").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/feed"),
      s"$tmp/base", s"$tmp/work", "id", s"$tmp/ckpt")
    drain()
    val snap = graft.streaming.ScoringStream
      .readLatestSnapshot(spark, s"$tmp/work", s"$tmp/base")
      .as[(Long, Long)].collect().toSet
    assert(snap == Set((1L, 10L), (3L, 99L), (7L, 70L)), snap.toString)
    // restart: checkpoint replays nothing, snapshot unchanged
    drain()
    val snap2 = graft.streaming.ScoringStream
      .readLatestSnapshot(spark, s"$tmp/work", s"$tmp/base")
      .as[(Long, Long)].collect().toSet
    assert(snap2 == snap)
    // intermediate generations stayed readable (poor-man's time travel)
    val gens = new java.io.File(s"$tmp/work").listFiles()
      .filter(_.getName.startsWith("gen_"))
    assert(gens.length >= 2, s"expected several generations: ${gens.length}")
  }

  test("FK monitor: additive partials sum to the batch audit and " +
    "replayed batches collapse") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_fkmon").toString
    val b0 = Seq((3L, 1L, 1L, 0L))
      .toDF("n_rows", "n_orphans", "n_null_fk", "batch_id")
    val b1 = Seq((2L, 0L, 0L, 1L))
      .toDF("n_rows", "n_orphans", "n_null_fk", "batch_id")
    b0.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp) // simulated foreachBatch retry
    val got = ScoringStream.readFkMonitor(spark, tmp, "t").collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) == (("t", 5L, 1L, 1L, 2000L)),
      got.toString)
  }

  test("token monitor: additive per-source partials collapse and sum " +
    "to the batch token masses") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_tokmon").toString
    val b0 = Seq(("s1", 10L, 0L), ("s2", 5L, 0L))
      .toDF("source", "tokens", "batch_id")
    val b1 = Seq(("s1", 7L, 1L)).toDF("source", "tokens", "batch_id")
    b0.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp) // retry duplicate
    val got = ScoringStream.readTokenMonitor(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> 17L, "s2" -> 5L), got.toString)
  }

  test("novelty monitor: additive per-source partials collapse and sum " +
    "to the batch shares") {
    import spark.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_novmon").toString
    val b0 = Seq(("s1", 3L, 1L, 0L), ("s2", 2L, 0L, 0L))
      .toDF("grp", "n_rows", "n_novel", "batch_id")
    val b1 = Seq(("s1", 2L, 2L, 1L)).toDF("grp", "n_rows", "n_novel",
      "batch_id")
    b0.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp) // retry duplicate
    val got = ScoringStream.readNoveltyMonitor(spark, tmp)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("s1" -> ((5L, 3L, 6000L)), "s2" -> ((2L, 0L, 0L))),
      got.toString)
  }
}
