package graft

import org.apache.spark.sql.functions._

import graft.similarity.SemanticScreen

/** Semantic decontamination screen: exact max-cosine semantics, hit
  * counting, zero-vector handling, and the broadcast-refs plan shape. */
class SemanticScreenSpec extends SparkSpec {

  import spark.implicits._

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("id", "vec")

  test("exact copy and near-copy flagged; orthogonal not") {
    val refs = vecs(100L -> Seq(1f, 0f, 0f), 101L -> Seq(0f, 1f, 0f))
    val corpus = vecs(
      1L -> Seq(2f, 0f, 0f),        // same direction as ref 100 → cos 1
      2L -> Seq(0.98f, 0.02f, 0f),  // near-copy of ref 100
      3L -> Seq(0f, 0f, 5f))        // orthogonal to both
    val out = SemanticScreen.screen(corpus, "id", "vec",
      refs, "id", "vec", tauMicro = 950000L)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("max_cos_uu"), r.getAs[Long]("n_hits"),
          r.getAs[Int]("contaminated"))).toMap
    assert(out(1L)._3 == 1 && out(1L)._1 >= 999999L, s"got ${out(1L)}")
    assert(out(2L)._3 == 1, s"near-copy not flagged: ${out(2L)}")
    assert(out(3L)._3 == 0 && out(3L)._2 == 0L,
      s"orthogonal flagged: ${out(3L)}")
  }

  test("n_hits counts every reference above tau, not just the max") {
    // corpus doc equidistant-close to BOTH refs
    val refs = vecs(100L -> Seq(1f, 0.01f), 101L -> Seq(1f, -0.01f))
    val corpus = vecs(1L -> Seq(1f, 0f))
    val out = SemanticScreen.screen(corpus, "id", "vec",
      refs, "id", "vec", tauMicro = 990000L).collect().head
    assert(out.getAs[Long]("n_hits") == 2L, s"expected 2 hits: $out")
    assert(out.getAs[Int]("contaminated") == 1)
  }

  test("zero vectors score cos 0 against everything (no NaN ranking)") {
    val refs = vecs(100L -> Seq(1f, 0f))
    val corpus = vecs(1L -> Seq(0f, 0f))
    val out = SemanticScreen.screen(corpus, "id", "vec",
      refs, "id", "vec", tauMicro = 500000L).collect().head
    assert(out.getAs[Long]("max_cos_uu") == 0L, s"zero vec: $out")
    assert(out.getAs[Int]("contaminated") == 0)
  }

  test("every corpus id appears exactly once (full screen, no dropouts)") {
    val refs = vecs(100L -> Seq(1f, 0f, 0f))
    val corpus = vecs((1L to 20L).map(i =>
      i -> Seq(i.toFloat, (i % 3).toFloat, 1f)): _*)
    val out = SemanticScreen.screen(corpus, "id", "vec",
      refs, "id", "vec", tauMicro = 999000L)
    assert(out.count() == 20L)
    assert(out.select("id").distinct().count() == 20L)
  }

  test("plan: refs broadcast onto the corpus scan (single 1-build BNLJ)") {
    val refs = vecs(100L -> Seq(1f, 0f))
    val corpus = vecs((1L to 50L).map(i => i -> Seq(i.toFloat, 1f)): _*)
    val plan = SemanticScreen.screen(corpus, "id", "vec",
      refs, "id", "vec", tauMicro = 900000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the deliberate small-build-side nested loop (q20's exempt shape):
    // exactly one, building the broadcast refs side
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length == 1, plan)
    assert(plan.contains("BuildRight"), s"refs must be the build side:\n$plan")
  }

  test("count-then-cap: over-cap refs degrade to a partitioned cartesian " +
    "with identical rows (no driver broadcast)") {
    val refs = vecs(100L -> Seq(1f, 0f, 0f), 101L -> Seq(0f, 1f, 0f),
      102L -> Seq(0.6f, 0.8f, 0f))
    val corpus = vecs((1L to 30L).map(i =>
      i -> Seq(i.toFloat, (i % 5).toFloat, 1f)): _*)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("max_cos_uu"), r.getAs[Long]("n_hits"),
        r.getAs[Int]("contaminated"))).toSet
    // threshold -1 isolates the hint: an unhinted small crossJoin side
    // would otherwise still auto-broadcast and mask the fallback
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bc = SemanticScreen.screen(corpus, "id", "vec",
        refs, "id", "vec", tauMicro = 950000L)
      val ct = SemanticScreen.screen(corpus, "id", "vec",
        refs, "id", "vec", tauMicro = 950000L, maxBroadcastRefs = 0L)
      assert(bc.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      val ctPlan = ct.queryExecution.executedPlan.toString
      assert(ctPlan.contains("CartesianProduct") &&
        !ctPlan.contains("Broadcast"),
        s"over-cap screen must be a partitioned cartesian:\n$ctPlan")
      assert(rows(bc) == rows(ct), "broadcast and cartesian regimes differ")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
