package graft

import org.apache.spark.sql.functions._

import graft.operators.Reputation

class ReputationSpec extends SparkSpec {
  import spark.implicits._

  // "aaa bbb ccc": 11 chars, 3 tokens, 0 stopwords → q = floor(220·3/3) = 220
  private val t1 = "aaa bbb ccc"
  // "ddd eee": 7 chars, 2 tokens → q = 140
  private val t2 = "ddd eee"

  private def run(rows: Seq[(String, Long, String)],
                  pr: Seq[(String, Long)]) =
    Reputation.hostReputation(rows.toDF("host", "id", "text"),
        "host", "id", "text", pr.toDF("node", "pr"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("hand-computed rollup: quality mean, dup share, rank fusion") {
    val got = run(
      Seq(("A", 1L, t1), ("A", 2L, t1), ("B", 3L, t2)),
      Seq(("A", 2000000L)))
    // A: 2 docs, qmean 220, dup_bp 5000, pr 2000000
    //    rep = ((2000000·220) div 1e4 = 44000) · 5000 div 1e4 = 22000
    assert(got("A") == ((2L, 220L, 5000L, 2000000L, 22000L)), got.toString)
    // B: absent from the graph → 150000 floor; no dups
    //    rep = ((150000·140) div 1e4 = 2100) · 10000 div 1e4 = 2100
    assert(got("B") == ((1L, 140L, 0L, 150000L, 2100L)), got.toString)
  }

  test("exact-dup grouping is global: a cross-host copy is the dup, " +
    "charged to the host holding the higher id") {
    val got = run(
      Seq(("A", 1L, t1), ("B", 2L, t1)),
      Seq(("A", 1000000L), ("B", 1000000L)))
    assert(got("A")._3 == 0L && got("B")._3 == 10000L)
  }

  test("partitioning invariance") {
    val rows = (0L until 90L).map(i =>
      (s"h${i % 9}", i, if (i % 4 == 0) t1 else s"$t2 x${('a' + i % 11).toChar}"))
    val pr = (0 until 9).map(i => (s"h$i", 500000L + i * 1000L))
    val a = run(rows, pr)
    val b = Reputation.hostReputation(
        rows.toDF("host", "id", "text").repartition(7),
        "host", "id", "text", pr.toDF("node", "pr"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(a == b)
  }

  test("shuffles carry fingerprints, not text: the dup grouping keys on fp") {
    val df = Reputation.hostReputation(
      Seq(("A", 1L, t1)).toDF("host", "id", "text"),
      "host", "id", "text", Seq(("A", 1L)).toDF("node", "pr"))
    assertNoCartesian(df)
    // the aggregate feeding the keeper join must group by fp, not text
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("fp"), plan.take(1500))
  }
}
