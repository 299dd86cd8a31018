package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("withLabel casts to double; dropNaSubset drops only listed columns") {
    val df = Seq((Some(5), Some("x")), (None, Some("y")), (Some(3), None))
      .toDF("stars", "text")
    val labeled = Relational.withLabel(df, "stars")
    assert(labeled.schema("label").dataType.typeName == "double")
    assert(Relational.dropNaSubset(labeled, Seq("label")).count() == 2)
    assert(Relational.dropNaSubset(labeled, Seq("label", "text")).count() == 1)
  }

  test("project and rename") {
    val df = Seq((1, "a", true)).toDF("x", "y", "z")
    val out = Relational.rename(Relational.project(df, Seq("x", "y")), "y", "w")
    assert(out.columns.toSeq == Seq("x", "w"))
  }

  test("leftEnrich keeps unmatched fact rows and broadcasts the dim") {
    val fact = Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v")
    val dim = Seq((1, "a"), (2, "b")).toDF("dk", "name")
    val out = Relational.leftEnrich(fact, dim, col("k") === col("dk"))
    assert(out.count() == 3)
    assert(out.filter(col("name").isNull).select("k").as[Int].head() == 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast:\n$plan")
  }

  test("flagFill fills nulls only") {
    val df = Seq((1, Some(1)), (2, None)).toDF("k", "flag")
    val out = Relational.flagFill(df, "flag", lit(0))
      .orderBy("k").select("flag").as[Int].collect().toSeq
    assert(out == Seq(1, 0))
  }

  test("explodeDelimited + topNByCount with deterministic tiebreak") {
    val df = Seq("a;b", "b;c", "b").toDF("cats")
    val exploded = Relational.explodeDelimited(df, "cats", "cat", ";")
    val top = Relational.topNByCount(exploded, "cat", 2).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("b", "a")) // b=3; a and c tie -> a
    assert(top.map(_.getLong(1)).toSeq == Seq(3L, 1L))
  }

  test("histogram buckets match a hand-computed reference") {
    val df = (0 until 100).toDF("v") // min 0, max 99, 10 buckets of width 9.9
    val hist = Relational.histogram(df, col("v"), 10)
      .orderBy("bucket").collect()
    assert(hist.length == 10)
    assert(hist.map(_.getLong(1)).sum == 100L)
    // max value lands in the top bucket (capped by least())
    assert(hist.last.getInt(0) == 9)
  }

  test("histogram degenerate: constant column goes to bucket 0") {
    val df = Seq(5, 5, 5).toDF("v")
    val hist = Relational.histogram(df, col("v"), 10).collect()
    assert(hist.length == 1 && hist.head.getInt(0) == 0 &&
      hist.head.getLong(1) == 3L)
  }

  test("rollupStats emits detail, subtotal and grand-total rows") {
    val df = Seq(("en", "web", 10L), ("en", "web", 20L), ("en", "book", 5L),
      ("fr", "web", 1L)).toDF("lang", "src", "v")
    val out = Relational.rollupStats(df, "lang", "src", "v")
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3))).toSet
    assert(out == Set(
      (Some("en"), Some("web"), 2L, 30L),
      (Some("en"), Some("book"), 1L, 5L),
      (Some("fr"), Some("web"), 1L, 1L),
      (Some("en"), None, 3L, 35L),
      (Some("fr"), None, 1L, 1L),
      (None, None, 4L, 36L)))
    // one Expand + aggregate, not three scans
    val plan = Relational.rollupStats(df, "lang", "src", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
  }

  test("pivotCounts zero-fills and never runs a distinct-discovery job") {
    val df = Seq(("w", "en"), ("w", "en"), ("w", "fr"), ("b", "en"))
      .toDF("src", "lang")
    val out = Relational.pivotCounts(df, "src", "lang", Seq("en", "fr", "zh"))
    assert(out.columns.toSeq == Seq("src", "en", "fr", "zh"))
    val m = out.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m("w") == ((2L, 1L, 0L)) && m("b") == ((1L, 0L, 0L)))
    // explicit values: the analyzed plan exists without running any job —
    // a distinct-discovery pivot would need an eager collect here
    assert(out.queryExecution.analyzed != null)
  }

  test("cubeStats emits all four grouping sets with grouping_id " +
    "disambiguating subtotals from genuine NULLs") {
    val df = Seq(
      ("en", "web", 10L), ("en", "web", 20L), ("en", "book", 5L),
      (null.asInstanceOf[String], "web", 1L))
      .toDF("lang", "src", "v")
    val got = Relational.cubeStats(df, "lang", "src", "v")
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4))).toMap
    // detail rows (gid 0): the genuine-NULL lang row keeps gid 0
    assert(got((Some("en"), Some("web"), 0L)) == ((2L, 30L)))
    assert(got((None, Some("web"), 0L)) == ((1L, 1L)))
    // lang subtotal (gid 1: src aggregated)
    assert(got((Some("en"), None, 1L)) == ((3L, 35L)))
    // src subtotal (gid 2: lang aggregated) — distinct from the genuine
    // NULL-lang detail row above
    assert(got((None, Some("web"), 2L)) == ((3L, 31L)))
    // grand total (gid 3)
    assert(got((None, None, 3L)) == ((4L, 36L)))
    val plan = Relational.cubeStats(df, "lang", "src", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
  }
}
