package graft

import graft.operators.Semistructured

class SemistructuredSpec extends SparkSpec {
  import spark.implicits._

  test("declared fields surface as typed columns; extras are ignored") {
    val df = Seq(
      (1L, """{"k": 7, "tag": "a", "extra": true}"""),
      (2L, """{"k": 9}"""))
      .toDF("id", "props")
    val got = Semistructured.extractJson(df, "props", "k INT, tag STRING")
      .select("id", "k", "tag").collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == ((Some(7), Some("a"))), got.toString)
    assert(got(2L) == ((Some(9), None))) // absent key -> NULL field
  }

  test("malformed JSON and type mismatches yield NULL, never an abort") {
    val df = Seq(
      (1L, """{"k": 7}"""),
      (2L, """not json at all"""),
      (3L, """{"k": "not-an-int"}"""),
      (4L, null.asInstanceOf[String]))
      .toDF("id", "props")
    val got = Semistructured.extractJson(df, "props", "k INT")
      .select("id", "k").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(1L -> Some(7), 2L -> None, 3L -> None, 4L -> None),
      got.toString)
  }

  test("parsing is a pure per-row projection (zero shuffles)") {
    val df = Semistructured.extractJson(
      Seq((1L, """{"k": 1}""")).toDF("id", "props"), "props", "k INT")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      df.queryExecution.executedPlan.toString)
  }

  test("keyInventory: observed keys with multiplicity-free per-row " +
    "counts, fill rates against ALL rows incl. null payloads") {
    import spark.implicits._
    val df = Seq(
      Some("""{"a": 1, "b": 2}"""),
      Some("""{"a": 3}"""),
      None,
      Some("""{"c": null}""")).toDF("props")
    val got = graft.operators.Semistructured.keyInventory(df, "props")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> ((2L, 5000L)), "b" -> ((1L, 2500L)),
      "c" -> ((1L, 2500L))), got.toString)
  }
}
