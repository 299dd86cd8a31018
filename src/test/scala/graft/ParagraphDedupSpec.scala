package graft

import org.apache.spark.sql.functions._

import graft.dedup.ParagraphDedup

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    ParagraphDedup.keepFirst(docs.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("repeated paragraph keeps only its first (doc, pos) occurrence") {
    val out = run(Seq(
      (1L, "intro\nbody one"),
      (2L, "intro\nbody two"),
      (3L, "body two\nintro\ntail")))
    // "intro" first occurs at (doc 1, pos 0) so docs 2 and 3 lose it;
    // "body two" first occurs at (doc 2, pos 1) — doc 2 has the lower id —
    // so doc 3 loses that too and is left with only "tail"
    assert(out == Map(
      1L -> ((2L, "intro\nbody one")),
      2L -> ((1L, "body two")),
      3L -> ((1L, "tail"))))
  }

  test("within-doc repetition collapses to the first position") {
    val out = run(Seq((1L, "same\nother\nsame")))
    assert(out == Map(1L -> ((2L, "same\nother"))))
  }

  test("a doc whose every paragraph first occurred elsewhere disappears") {
    val out = run(Seq((1L, "a\nb"), (2L, "a\nb")))
    assert(out == Map(1L -> ((2L, "a\nb"))))
  }

  test("order within a doc is original paragraph order, not sort order") {
    val out = run(Seq((1L, "zebra\napple\nmiddle")))
    assert(out(1L)._2 == "zebra\napple\nmiddle")
  }

  test("regex-metachar separator splits on the literal character") {
    val out = ParagraphDedup.keepFirst(
      Seq((1L, "x|y|x")).toDF("id", "text"), "id", "text", sep = "|")
      .collect().head
    assert(out.getLong(1) == 2L && out.getString(2) == "x|y")
  }

  test("partitioning-invariant (min over a total order)") {
    val docs = (1 to 100).map(i =>
      (i.toLong, s"shared preamble\nunique body $i\nshared footer"))
    val one = ParagraphDedup.keepFirst(
      docs.toDF("id", "text").repartition(1), "id", "text")
      .orderBy("id").collect().toSeq
    val many = ParagraphDedup.keepFirst(
      docs.toDF("id", "text").repartition(17), "id", "text")
      .orderBy("id").collect().toSeq
    assert(one == many)
    // only doc 1 keeps the shared paragraphs
    assert(one.head.getString(2) ==
      "shared preamble\nunique body 1\nshared footer")
    assert(one(1).getString(2) == "unique body 2")
  }

  test("plan: keep-first is one aggregation, no self-join of the corpus") {
    val docs = (1 to 50).map(i => (i.toLong, s"p$i\ncommon")).toDF("id", "text")
    val plan = ParagraphDedup.keepFirst(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }
}
