package graft

import org.apache.spark.sql.functions._
import graft.textstats.VocabCoverage

class VocabCoverageSpec extends SparkSpec {
  import spark.implicits._

  test("oovReport counts occurrences, types, and basis points exactly") {
    // vocab (K=2) by count: "aa" (3), "bb" (2); OOV: "cc" (2 occ), "dd" (1)
    val docs = Seq(
      ("s1", "aa aa bb cc"),
      ("s2", "aa bb cc dd")
    ).toDF("source", "text")
    val got = VocabCoverage.oovReport(docs, "text", "source", vocabSize = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // s1: 4 tokens, 1 oov (cc), 1 type, 2500 bp; s2: 4 tokens, 2 oov
    // (cc, dd), 2 types, 5000 bp
    assert(got == Map("s1" -> (4L, 1L, 1L, 2500L),
                      "s2" -> (4L, 2L, 2L, 5000L)), s"got $got")
  }

  test("vocab ties break lexicographically (deterministic truncation)") {
    // "bb" and "cc" both appear twice; K=2 must keep "aa" (3) and "bb"
    // (lexicographically before "cc" at equal count)
    val docs = Seq(("s", "aa aa aa bb bb cc cc")).toDF("source", "text")
    val got = VocabCoverage.oovReport(docs, "text", "source", vocabSize = 2)
      .collect().head
    assert(got.getLong(2) == 2L, s"expected cc's 2 occurrences OOV: $got")
    assert(got.getLong(3) == 1L)
  }

  test("null and empty texts contribute no tokens; vocab join is broadcast") {
    val docs = Seq(("s1", "aa bb"), ("s2", null), ("s3", ""))
      .toDF("source", "text")
    val got = VocabCoverage.oovReport(docs, "text", "source", vocabSize = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("s1" -> 2L), s"token-less sources must not appear: $got")
    val plan = VocabCoverage.oovReport(
      graft.sources.Tables.documents(spark, sfDir), "text", "source", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab membership must broadcast, not shuffle the token stream:\n$plan")
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
