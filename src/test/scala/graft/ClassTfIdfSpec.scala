package graft

import graft.textstats.ClassTfIdf

class ClassTfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed c-TF-IDF: class-exclusive terms outrank shared " +
    "ones; exact micro-nat scores") {
    val docs = Seq(
      (1L, "a", "apple apple banana"),
      (2L, "b", "cherry banana"))
      .toDF("id", "cls", "text")
    val got = ClassTfIdf.topClassTerms(docs, "cls", "text", k = 2)
      .as[(String, String, Long, Int)].collect()
      .map(r => (r._1, r._4) -> ((r._2, r._3))).toMap
    // tot = 5, nc = 2, A = 5 div 2 = 2
    // idf(apple) = idf(banana) = floor(ln((2+2)/2)·1e6) = 693147
    // idf(cherry) = floor(ln((1+2)/1)·1e6) = 1098612
    val ln2 = math.floor(math.log(4.0 / 2.0) * 1e6).toLong
    val ln3 = math.floor(math.log(3.0 / 1.0) * 1e6).toLong
    assert(got(("a", 1)) == (("apple", 2 * ln2)), got.toString)
    assert(got(("a", 2)) == (("banana", ln2)))
    assert(got(("b", 1)) == (("cherry", ln3)))
    assert(got(("b", 2)) == (("banana", ln2)))
  }

  test("ties order by token ascending; k caps per class") {
    val docs = Seq(
      (1L, "a", "zeta beta"), (2L, "b", "gamma delta"))
      .toDF("id", "cls", "text")
    // every term unique to its class with tf 1 -> identical scores;
    // token asc breaks ties
    val got = ClassTfIdf.topClassTerms(docs, "cls", "text", k = 1)
      .as[(String, String, Long, Int)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got == Map("a" -> "beta", "b" -> "delta"), got.toString)
  }

  test("partitioning invariance; aggregator plan avoids the class-vocab " +
    "window sort") {
    val docs = sources.Tables.documents(spark, sfDir)
    val a = ClassTfIdf.topClassTerms(docs, "source", "text", k = 3)
      .as[(String, String, Long, Int)].collect().toSet
    val b = ClassTfIdf.topClassTerms(docs.repartition(7), "source", "text",
      k = 3).as[(String, String, Long, Int)].collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
    val plan = ClassTfIdf.topClassTerms(docs, "source", "text", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"top-k must ride the aggregator, not a window sort:\n$plan")
  }
}
