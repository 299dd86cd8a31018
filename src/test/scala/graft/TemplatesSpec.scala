package graft

import graft.textstats.Templates

class TemplatesSpec extends SparkSpec {
  import spark.implicits._

  test("digit runs mask to one '#'; machine lines collapse, prose stays") {
    val docs = Seq(
      "GET /api/v2/users/12345 took 83ms",
      "GET /api/v2/users/99 took 7ms",
      "GET /api/v2/users/12345 took 83ms",
      "the quick brown fox jumps over it")
      .map(Tuple1(_)).toDF("text")
    val got = Templates.topTemplates(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.head == (("GET /api/v#/users/# took #ms", 3L)),
      got.mkString(","))
    assert(got(1) == (("the quick brown fox jumps over it", 1L)))
  }

  test("ties order lexicographically; k truncates; nulls are dropped") {
    val docs = Seq(Some("b 1"), Some("a 2"), Some("c 3"), None)
      .map(Tuple1(_)).toDF("text")
    val got = Templates.topTemplates(docs, "text", 2)
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("a #", "b #"), got.mkString(","))
  }

  test("top-k is TakeOrdered over the counts, not a full sort shuffle") {
    // more input rows than k, so EliminateLimits cannot drop the cut
    val docs = (1 to 40).map(i => s"template $i kind ${i % 20}")
      .map(Tuple1(_)).toDF("text")
    val df = Templates.topTemplates(docs, "text", 5)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), s"global sort planned:\n$p")
  }
}
