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
}
