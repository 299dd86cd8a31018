package graft

import org.apache.spark.sql.functions._

import graft.textstats.Keywords

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("topKeywords ranks rare repeated terms above common ones") {
    val docs = Seq(
      (1L, "spark spark spark common common word"),
      (2L, "common word filler filler"),
      (3L, "common word other")
    ).toDF("id", "text")
    val out = Keywords.topKeywords(docs, "id", "text", topK = 2)
      .as[(Long, String, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(_._2).toSeq).toMap
    // doc 1: spark tf=3 df=1 -> 3e6; common tf=2 df=3 -> 666666
    assert(out(1L) == Seq("spark", "common"))
    // doc 2: filler tf=2 df=1 -> 2e6 beats common/word (df=3)
    assert(out(2L).head == "filler")
    // doc 3: other tf=1 df=1 -> 1e6 beats common and word
    assert(out(3L).head == "other")
  }

  test("ties break on token ascending; rank is dense per doc") {
    val docs = Seq((1L, "beta alpha gamma")).toDF("id", "text")
    // all three: tf=1, df=1 -> equal score; order must be alphabetical
    val out = Keywords.topKeywords(docs, "id", "text", topK = 3)
      .orderBy("rank").select("token").as[String].collect().toSeq
    assert(out == Seq("alpha", "beta", "gamma"))
  }

  test("integer score is exact div, never float") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "a d")).toDF("id", "text")
    val row = Keywords.topKeywords(docs, "id", "text", topK = 3)
      .filter(col("token") === "a").select("score").as[Long].head()
    assert(row == 1000000L / 3L) // 333333, floored — not 333333.33 rounded
  }

  test("tf aggregation is partial before the exchange") {
    val docs = Seq((1L, "x y"), (2L, "y z")).toDF("id", "text")
    val plan = Keywords.topKeywords(docs, "id", "text")
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }
}
