package graft

import graft.operators.Trending

class TrendingSpec extends SparkSpec {
  import spark.implicits._

  test("top-k per period with deterministic (n desc, item) ties; " +
    "k caps each period independently") {
    val rows =
      Seq.fill(3)((1L, "a")) ++ Seq.fill(3)((1L, "b")) ++
        Seq.fill(1)((1L, "c")) ++
        Seq.fill(2)((2L, "z")) ++ Seq.fill(1)((2L, "y"))
    val got = Trending.topItemsPerPeriod(rows.toDF("day", "item"),
      "day", "item", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3)) ->
        (r.getString(1), r.getLong(2))).toMap
    assert(got == Map(
      (1L, 1) -> (("a", 3L)),  // tie at 3 -> 'a' before 'b'
      (1L, 2) -> (("b", 3L)),
      (2L, 1) -> (("z", 2L)),
      (2L, 2) -> (("y", 1L))), got.toString)
  }

  test("null periods/items are excluded; partial aggregation caps " +
    "map-side (no per-period sort window)") {
    val df = Seq(
      (Some(1L), Some("a")), (None: Option[Long], Some("x")),
      (Some(1L), None: Option[String]))
      .toDF("day", "item")
    val out = Trending.topItemsPerPeriod(df, "day", "item", 3)
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a")))
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"per-period sort window planned:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      p)
  }
}
