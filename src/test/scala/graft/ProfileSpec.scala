package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact nulls, distincts, min/max per column") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("a")), (5L, None))
      .toDF("id", "tag")
    val out = Profile.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(out("id") == ((5L, 0L, 5L, "1", "5")))
    assert(out("tag") == ((5L, 2L, 2L, "a", "b")))
  }

  test("profile runs as ONE job: a single aggregation, no per-column scans") {
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "tag")
    val plan = Profile.profile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    // exactly one scan of the input relation
    val scans = "LocalTableScan".r.findAllIn(plan).size +
      "FileScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
    // multi-distinct plans through Expand, still one aggregation pipeline
    assert(plan.contains("Expand"), s"no Expand for multi-distinct:\n$plan")
  }

  test("empty frame: zero rows, zero distincts, null min/max") {
    val df = Seq.empty[(Long, String)].toDF("id", "tag")
    val out = Profile.profile(df, Seq("tag")).collect().head
    assert(out.getLong(1) == 0L && out.getLong(3) == 0L && out.isNullAt(4))
  }
}
