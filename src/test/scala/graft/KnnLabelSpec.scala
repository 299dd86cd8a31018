package graft

import org.apache.spark.sql.functions._

import graft.similarity.KnnLabel

class KnnLabelSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Float], Int)]) =
    rows.toDF("vec_id", "embedding", "label")

  test("majority of the k nearest labeled neighbors wins") {
    // axis-aligned clusters: label 0 along +x, label 1 along +y;
    // query 100 sits near +x, query 101 near +y
    val labeled = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(0.9f, 0.1f), 0), (3L, Seq(0.8f, 0.2f), 0),
      (4L, Seq(0f, 1f), 1), (5L, Seq(0.1f, 0.9f), 1), (6L, Seq(0.2f, 0.8f), 1))
    val queries = Seq(
      (100L, Seq(0.95f, 0.05f), -1), (101L, Seq(0.05f, 0.95f), -1))
    val out = KnnLabel.knnLabel(df(labeled ++ queries), "vec_id", "embedding",
        "label", col("vec_id") >= 100L, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out == Map(100L -> ((0, 3L)), 101L -> ((1, 3L))))
  }

  test("vote tie breaks to the smaller label, deterministically") {
    // k=2: one neighbor of each label equidistant-ish -> 1 vote each
    val labeled = Seq(
      (1L, Seq(1f, 0f), 7), (2L, Seq(0f, 1f), 3))
    val queries = Seq((100L, Seq(0.7071f, 0.7071f), -1))
    val out = KnnLabel.knnLabel(df(labeled ++ queries), "vec_id", "embedding",
        "label", col("vec_id") >= 100L, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(out == Map(100L -> ((3, 1L))))
  }

  test("only labeled rows vote; queries never match themselves or each other") {
    val labeled = Seq((1L, Seq(1f, 0f), 5))
    val queries = Seq(
      (100L, Seq(1f, 0f), 9), (101L, Seq(1f, 0.01f), 8))
    val out = KnnLabel.knnLabel(df(labeled ++ queries), "vec_id", "embedding",
        "label", col("vec_id") >= 100L, k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // both queries can only see the single labeled vector
    assert(out == Map(100L -> 5, 101L -> 5))
  }

  test("agrees with a local brute-force replay on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 60L).map { i =>
      (i, Seq.fill(8)(rnd.nextFloat() - 0.5f), (i % 4).toInt)
    }
    val isQ: Long => Boolean = _ % 10 == 0
    val out = KnnLabel.knnLabel(df(rows), "vec_id", "embedding", "label",
        col("vec_id") % 10 === 0, k = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def nrm(v: Seq[Float]) = math.sqrt(v.map(x => x.toDouble * x).sum)
      val (na, nb) = (nrm(a), nrm(b))
      if (na == 0 || nb == 0) 0.0
      else a.zip(b).map { case (x, y) => x.toDouble / na * (y.toDouble / nb) }.sum
    }
    val local = rows.filter(r => isQ(r._1)).map { case (qid, qv, _) =>
      val top = rows.filterNot(r => isQ(r._1))
        .map { case (cid, cv, lb) => (cid, lb, cos(qv, cv)) }
        .sortBy { case (cid, _, c) => (-c, cid) }.take(5)
      val votes = top.groupBy(_._2).view.mapValues(_.size).toMap
      val best = votes.toSeq.sortBy { case (lb, n) => (-n, lb) }.head._1
      qid -> best
    }.toMap
    assert(out == local)
  }

  test("plan: labeled corpus is never shuffled — broadcast joins only") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 40L).map { i =>
      (i, Seq.fill(4)(rnd.nextFloat()), (i % 2).toInt)
    }
    val plan = KnnLabel.knnLabel(df(rows), "vec_id", "embedding", "label",
        col("vec_id") % 10 === 0, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"), s"corpus-shuffling join in:\n$plan")
  }

  test("count-then-cap: an over-cap shortlist degrades the label-fetch " +
    "join to a shuffle with identical rows") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 50L).map { i =>
      (i, Seq.fill(6)(rnd.nextFloat() - 0.5f), (i % 3).toInt)
    }
    def preds(k: Long) = KnnLabel.knnLabel(df(rows), "vec_id", "embedding",
      "label", col("vec_id") % 10 === 0, k = 4, maxBroadcastShortlist = k)
    // threshold -1 isolates the hint (the tiny labeled side would
    // otherwise auto-broadcast and mask the regime)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bc = preds(4000000L)
      val sh = preds(0L)
      assert(bc.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "under-cap shortlist must broadcast onto the labeled scan")
      val shPlan = sh.queryExecution.executedPlan.toString
      assert(!shPlan.contains("BroadcastHashJoin") &&
        (shPlan.contains("SortMergeJoin") ||
          shPlan.contains("ShuffledHashJoin")),
        s"over-cap label fetch should be a shuffle join:\n$shPlan")
      val a = bc.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val b = sh.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      assert(a == b, "broadcast and shuffle regimes differ")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
