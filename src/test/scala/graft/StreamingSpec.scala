package graft

import org.apache.spark.sql.functions._

import graft.ml.Sentiment
import graft.sources.Tables
import graft.streaming.ScoringStream

class StreamingSpec extends SparkSpec {

  test("windowedAgg over the events stream equals the batch equivalent") {
    val streamed = ScoringStream.runToMemory(spark,
      ScoringStream.windowedAgg(
        ScoringStream.eventsStream(spark, s"$sfDir/events.parquet")),
      "complete")
    val batch = Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getTimestamp(0).getTime, r.getString(1))
    val s = streamed.collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    val b = batch.collect().map(r => key(r) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(s == b, s"stream=${s.size} batch=${b.size} diff=${(s.toSet diff b.toSet).take(3)}")
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
}
