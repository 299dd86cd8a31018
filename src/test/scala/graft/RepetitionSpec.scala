package graft

import org.apache.spark.sql.functions._

import graft.textstats.Repetition

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("distinctTokenBp: all-distinct = 10000, half-distinct = 5000") {
    val r = Seq("a b c d", "a a b b").toDF("text")
      .select(Repetition.distinctTokenBp(col("text")).as("bp"))
      .as[Long].collect().toSeq
    assert(r == Seq(10000L, 5000L))
  }

  test("dupLineBp: repeated lines counted, single line = 0") {
    val r = Seq("x\ny\nx\nx", "just one line").toDF("text")
      .select(Repetition.dupLineBp(col("text")).as("bp"))
      .as[Long].collect().toSeq
    assert(r == Seq(5000L, 0L)) // 4 lines, 2 distinct -> (4-2)/4
  }

  test("topNgramStats exact on a hand-built corpus") {
    val df = Seq(
      (1L, "spam spam spam eggs"),   // top token 3, top bigram "spam spam" 2
      (2L, "a b c d"),               // all unique, bigrams unique
      (3L, "solo")                   // one token, no bigrams
    ).toDF("doc_id", "text")
    val out = Repetition.topNgramStats(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(out(0).getLong(3) == 3 && out(0).getLong(4) == 2)
    assert(out(1).getLong(3) == 1 && out(1).getLong(4) == 1)
    assert(out(1).getLong(2) == 10000L)
    assert(out(2).getLong(3) == 1 && out(2).getLong(4) == 0)
  }

  test("topCharNgramStats exact: repeated window counted, short text whole") {
    val df = Seq(
      (1L, "abababab"),   // "abab" windows at 1,3,5 -> top cnt 3
      (2L, "abcdefgh"),   // all distinct -> 1
      (3L, "xy")          // shorter than 4 -> one whole-text gram
    ).toDF("doc_id", "text")
    val got = Repetition.topCharNgramStats(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(got(0).getLong(2) == 3, got(0).toString)
    assert(got(1).getLong(2) == 1)
    assert(got(2).getLong(1) == 2 && got(2).getLong(2) == 1)
  }

  test("topNgramStats aggregations are partial (map-side combine)") {
    val df = Seq((1L, "a a b")).toDF("doc_id", "text")
    val plan = Repetition.topNgramStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"expected partial aggregation in plan:\n$plan")
  }
}
