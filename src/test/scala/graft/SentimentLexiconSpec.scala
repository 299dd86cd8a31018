package graft

import graft.textstats.SentimentLexicon
import org.apache.spark.sql.functions._

class SentimentLexiconSpec extends SparkSpec {
  import spark.implicits._

  private def lex = SentimentLexicon.defaultLexicon(spark)

  private def scoreMap(rows: Seq[(Long, String)]) =
    SentimentLexicon.score(rows.toDF("id", "text"), "id", "text", lex)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

  /** The engine's compound formula replayed on the JVM — same IEEE
    * multiply/square-add/sqrt/divide sequence, so exact equality. */
  private def compound(s: Long): Long =
    math.floor((10000.0 * s) /
      math.sqrt(s.toDouble * s + 15000000.0)).toLong

  test("plain hits sum lexicon milli-valences; compound is the exact " +
    "floored VADER normalization") {
    val got = scoreMap(Seq(
      (1L, "good food"),                 // good=1900
      (2L, "great and awful service")))  // 3100 - 3000 = 100
    assert(got(1L) == ((2L, 1L, 1900L, compound(1900))), got.toString)
    assert(got(2L) == ((4L, 2L, 100L, compound(100))), got.toString)
  }

  test("negation flips and damps: prev-token negator applies the " +
    "-0.74 integer scalar") {
    val got = scoreMap(Seq((1L, "not good")))
    // -((740 * 1900) div 1000) = -1406
    assert(got(1L) == ((2L, 1L, -1406L, compound(-1406))), got.toString)
  }

  test("n't contractions negate through the apostrophe-split 't' token") {
    // "Don't like!" cleans to tokens [don, t, like]; prev(like) = t
    val got = scoreMap(Seq((1L, "Don't like!")))
    // -((740 * 1500) div 1000) = -1110
    assert(got(1L) == ((3L, 1L, -1110L, compound(-1110))), got.toString)
  }

  test("negator only reaches its immediate successor") {
    // "not very good": prev(good) = very, so no flip
    val got = scoreMap(Seq((1L, "not very good")))
    assert(got(1L) == ((3L, 1L, 1900L, compound(1900))), got.toString)
  }

  test("zero-hit and empty docs stay present with zero scores") {
    val got = scoreMap(Seq((1L, "the quick brown fox"), (2L, "")))
    assert(got(1L) == ((4L, 0L, 0L, 0L)), got.toString)
    assert(got(2L) == ((1L, 0L, 0L, 0L)), got.toString)  // split("")=[""]
  }

  test("truncating flip arithmetic is sign-correct (negative valences)") {
    // "not awful": awful=-3000 → -((740 * -3000) div 1000) = 2220
    val got = scoreMap(Seq((1L, "not awful")))
    assert(got(1L) == ((2L, 1L, 2220L, compound(2220))), got.toString)
  }

  test("distribution buckets the compound exactly and keeps groups") {
    val scored = SentimentLexicon.score(
      Seq((1L, "not good", "a"), (2L, "great", "a"), (3L, "", null))
        .toDF("id", "text", "src"), "id", "text", lex)
      .join(Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]))
        .toDF("id", "src"), Seq("id"))
    val got = SentimentLexicon.distribution(scored, "src")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        r.getLong(2)).toMap
    // compound(-1406) = -3413 → bucket (10000-3413) div 2000 = 3
    // compound(3100) = 6248 → bucket 8; compound 0 → bucket 5
    assert(compound(-1406) == -3413L && compound(3100) == 6248L)
    assert(got == Map((Some("a"), 3L) -> 1L, (Some("a"), 8L) -> 1L,
      (None, 5L) -> 1L), got.toString)
  }

  test("rowBuckets (the stateless streaming formulation) counts to the " +
    "batch distribution exactly, adversarial corpus included") {
    val docs = Seq(
      (1L, "not good", "a"), (2L, "great and awful service", "a"),
      (3L, "", "b"), (4L, "Don't like!", "b"), (5L, "not awful", null),
      (6L, "the quick brown fox", "a"), (7L, "worst worst worst", "b"),
      (8L, "no fun without love", "a"))
      .toDF("id", "text", "src")
    val batch = SentimentLexicon.distribution(
      SentimentLexicon.score(docs, "id", "text", lex)
        .join(docs.select(col("id"), col("src")), Seq("id")), "src")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        r.getLong(2)).toMap
    val rows = SentimentLexicon.rowBuckets(docs, "src", "text")
      .groupBy("grp", "bucket").agg(count(lit(1)).as("n"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        r.getLong(2)).toMap
    assert(rows == batch, s"row/batch drift: $rows vs $batch")
    // stateless: no aggregate below the per-row projection
    val plan = SentimentLexicon.rowBuckets(docs, "src", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"rowBuckets shuffles:\n$plan")
  }

  test("plan: lexicon broadcasts, no window, no per-token exchange " +
    "before the doc-level sum") {
    val df = SentimentLexicon.score(
      Seq((1L, "good")).toDF("id", "text"), "id", "text", lex)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"lexicon join is not broadcast:\n$plan")
    assert(!plan.contains("Window"), s"window leaked into plan:\n$plan")
    assertNoCartesian(df)
  }
}
