package graft

import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.dedup.Decontaminate

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val eight = "alpha beta gamma delta epsilon zeta eta theta"

  test("doc sharing an 8-gram with the benchmark is flagged; others are not") {
    val corpus = Seq(
      (1L, s"intro words then $eight and a tail"),  // contains the 8-gram
      (2L, "completely different content with no overlap at all here"),
      (3L, s"$eight")                               // the 8-gram exactly
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"prefix $eight suffix")).toDF("doc_id", "text")
    val hits = Decontaminate.contaminationHits(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(1L) && hits.contains(3L) && !hits.contains(2L))
  }

  test("short benchmark doc (< n tokens) matches whole-document, not skipped") {
    val corpus = Seq((1L, "tiny eval item"), (2L, "unrelated"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "tiny eval item")).toDF("doc_id", "text")
    val hits = Decontaminate.contaminationHits(corpus, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L))
  }

  test("decontaminate drops flagged docs and keeps the rest intact") {
    val corpus = Seq(
      (1L, s"$eight leaked"), (2L, "clean one"), (3L, "clean two"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, s"x $eight y")).toDF("doc_id", "text")
    val kept = Decontaminate.decontaminate(corpus, bench, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("minHits raises the overlap bar") {
    val corpus = Seq((1L, s"$eight only once here")).toDF("doc_id", "text")
    val bench = Seq((100L, eight)).toDF("doc_id", "text")
    assert(Decontaminate.contaminationHits(corpus, bench, "doc_id", "text",
      minHits = 5).count() == 0)
  }

  test("decontamination composes with a document stream (stream-static join)") {
    // the corpus side is a STREAM; the benchmark gram set is static —
    // contaminationHits' broadcast semi-join + count works unchanged as a
    // Structured Streaming stream-static join with a complete-mode agg
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_stream")
    Seq((1L, s"$eight leaked"), (2L, "clean content"))
      .toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir.toString + "/docs")
    val schema = spark.read.parquet(dir.toString + "/docs").schema
    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString + "/docs")
    val bench = Seq((100L, s"x $eight y")).toDF("doc_id", "text")
    val hits = Decontaminate.contaminationHits(stream, bench, "doc_id", "text")
    assert(hits.isStreaming)
    val got = graft.streaming.ScoringStream
      .runToMemory(spark, hits, "complete")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.contains(1L) && !got.contains(2L))
  }

  test("shuffle variant emits exactly the broadcast variant's rows") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val bcast = Decontaminate.contaminationHits(docs, bench,
      "doc_id", "text", n = 8).as[(Long, Long)].collect().toSet
    val shuf = Decontaminate.contaminationHitsShuffle(docs, bench,
      "doc_id", "text", n = 8).as[(Long, Long)].collect().toSet
    assert(bcast.nonEmpty && shuf == bcast)
  }

  test("benchmark side broadcasts; corpus is never shuffled by content") {
    val corpus = Seq((1L, eight)).toDF("doc_id", "text")
    val bench = Seq((100L, eight)).toDF("doc_id", "text")
    val df = Decontaminate.contaminationHits(corpus, bench, "doc_id", "text")
    assertNoCartesian(df)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark not broadcast:\n$plan")
  }

  test("duplicateSpans: planted shared span flags both docs, unique doc 0") {
    // docs 1 and 2 share one 8-token run; doc 3 shares nothing
    val shared = "a b c d e f g h"
    val docs = Seq(
      (1L, s"$shared one two three"),
      (2L, s"zero $shared"),
      (3L, "p q r s t u v w x")).toDF("doc_id", "text")
    val out = Decontaminate.duplicateSpans(docs, "doc_id", "text", n = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // doc 1: grams at offsets 0..3 (11 tokens) = 4 grams, 1 shared
    assert(out(1L) == ((4L, 1L)))
    // doc 2: 9 tokens = 2 grams, the shared one is at offset 1
    assert(out(2L) == ((2L, 1L)))
    // doc 3: 9 tokens = 2 grams, none shared
    assert(out(3L) == ((2L, 0L)))
  }

  test("duplicateSpans: exact copies are 100% duplicated (dup_bp = 10000)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val bps = Decontaminate.duplicateSpans(docs, "doc_id", "text")
      .select("dup_bp").as[Long].collect().toSeq
    assert(bps == Seq(10000L, 10000L))
  }

  test("duplicateSpans is partitioning-invariant") {
    val docs = (1 to 80).map(i =>
      (i.toLong, s"common prefix words here for all docs tail$i extra " +
        s"pad${i % 5} filler")).toDF("doc_id", "text")
    def run(p: Int) = Decontaminate.duplicateSpans(docs.repartition(p),
      "doc_id", "text").as[(Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }

  test("noveltyAttribution: first introducer scores its shared grams, " +
    "an exact later copy scores zero") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // 2 grams
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // copy
      (3L, "p q r s t u v w x"))                                  // unique
      .toDF("doc_id", "text")
    val got = Decontaminate.noveltyAttribution(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((2L, 2L, 10000L)), got.toString)
    assert(got(2L) == ((2L, 0L, 0L)))
    assert(got(3L) == ((2L, 2L, 10000L)))
  }

  test("noveltyAttribution: partial overlap counts only the novel grams") {
    val shared = "a b c d e f g h" // one 8-gram introduced by doc 1
    val docs = Seq(
      (1L, s"$shared one two three"), // 4 grams, all novel (min id)
      (2L, s"zero $shared"))          // 2 grams: one shared (doc 1's), one new
      .toDF("doc_id", "text")
    val got = Decontaminate.noveltyAttribution(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((4L, 4L, 10000L)), got.toString)
    assert(got(2L) == ((2L, 1L, 5000L)))
  }

  test("noveltyAgainstIndex: history grams are never novel, batch-internal " +
    "dups credit the min id, truly new docs score full — through a real " +
    "parquet round-trip of the index") {
    val hist = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"))
      .toDF("doc_id", "text")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_gramidx").toString
    Decontaminate.gramIndex(hist, "doc_id", "text")
      .write.mode("overwrite").parquet(tmp)
    val idx = spark.read.parquet(tmp)
    val inc = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota"), // re-upload
      (11L, "brand new words appear here for the first time"),     // novel
      (12L, "brand new words appear here for the first time"))     // batch dup
      .toDF("doc_id", "text")
    val got = Decontaminate.noveltyAgainstIndex(inc, "doc_id", "text", idx)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(10L) == ((2L, 0L, 0L)), got.toString)   // all in history
    assert(got(11L)._3 == 10000L)                      // first in batch
    assert(got(12L) == ((got(11L)._1, 0L, 0L)))        // loses to min id
  }

  test("noveltyAgainstIndex plan: increment grams broadcast onto the " +
    "index scan; the index is never shuffled") {
    val hist = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val idx = Decontaminate.gramIndex(hist, "doc_id", "text")
    val df = Decontaminate.noveltyAgainstIndex(
      Seq((2L, "a b c d e f g h j")).toDF("doc_id", "text"),
      "doc_id", "text", idx)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assertNoCartesian(df)
  }

  test("noveltyAttribution is partitioning-invariant") {
    val docs = (1 to 60).map(i =>
      (i.toLong, s"common prefix words here for all docs tail${i % 7} " +
        s"extra pad${i % 3} filler")).toDF("doc_id", "text")
    def run(p: Int) = Decontaminate.noveltyAttribution(docs.repartition(p),
      "doc_id", "text").as[(Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }
}
