package graft

import org.apache.spark.sql.functions._

import graft.textstats.Boilerplate

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  private def clean(df: org.apache.spark.sql.DataFrame, maxDocs: Int) =
    Boilerplate.removeHotLines(df, "id", "text", maxDocs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("hot lines vanish from every doc; rare lines and order survive") {
    val docs = Seq(
      (1L, "HEADER\nalpha one\nbeta two"),
      (2L, "HEADER\ngamma three"),
      (3L, "HEADER\ndelta four\nalpha one")).toDF("id", "text")
    val out = clean(docs, maxDocs = 2)
    // HEADER is in 3 docs > 2 -> dropped everywhere; "alpha one" is in
    // exactly 2 docs -> kept; original line order preserved
    assert(out == Map(
      1L -> "alpha one\nbeta two",
      2L -> "gamma three",
      3L -> "delta four\nalpha one"))
  }

  test("a doc whose every line is hot disappears (documented contract)") {
    val docs = Seq(
      (1L, "SAME"), (2L, "SAME"), (3L, "SAME"),
      (4L, "SAME\nunique tail")).toDF("id", "text")
    val out = clean(docs, maxDocs = 2)
    assert(out == Map(4L -> "unique tail"))
  }

  test("trim-normalization: padded variants count as the same line") {
    val docs = Seq(
      (1L, "  NAV BAR  \nkeep a"),
      (2L, "NAV BAR\nkeep b"),
      (3L, "\tNAV BAR\nkeep c")).toDF("id", "text")
    val out = clean(docs, maxDocs = 2)
    assert(out == Map(1L -> "keep a", 2L -> "keep b", 3L -> "keep c"))
  }

  test("duplicate lines WITHIN one doc count once for doc-frequency") {
    // "x" twice in doc 1 but only 2 distinct docs contain it -> kept
    val docs = Seq((1L, "x\nmid\nx"), (2L, "x\nother")).toDF("id", "text")
    val out = clean(docs, maxDocs = 2)
    assert(out(1L) == "x\nmid\nx" && out(2L) == "x\nother")
  }

  test("hot-set drop is a broadcast anti-join, no cartesian") {
    val docs = (0L until 200L).map(i =>
      (i, s"COMMON HEADER\nbody line $i")).toDF("id", "text")
    val out = Boilerplate.removeHotLines(docs, "id", "text", maxDocs = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"hot-line drop not broadcast anti:\n$plan")
    assertNoCartesian(out)
    assert(out.count() == 200)
    assert(!out.collect().exists(_.getString(1).contains("COMMON HEADER")))
  }

  test("blank lines never go hot: paragraph breaks survive even when " +
    "every document has them") {
    // 50 docs, all with a blank separator line — far past maxDocs; the
    // paragraph structure must survive while the planted banner dies
    val docs = (1L to 50L)
      .map(i => (i, s"COOKIE BANNER\npara one of $i\n\npara two of $i"))
      .toDF("id", "text")
    val out = graft.textstats.Boilerplate
      .removeHotLines(docs, "id", "text", maxDocs = 10)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 50)
    assert(out(7L) == "para one of 7\n\npara two of 7", out(7L))
  }
}
