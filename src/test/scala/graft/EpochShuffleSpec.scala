package graft

import org.apache.spark.sql.functions._
import graft.operators.EpochShuffle
import graft.sources.Tables

class EpochShuffleSpec extends SparkSpec {

  test("epochOrder emits an exact permutation of [0, n)") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val out = EpochShuffle.epochOrder(docs, "doc_id", epoch = 3)
    assert(out.count() == n)
    val pos = out.select("pos").collect().map(_.getLong(0)).sorted
    assert(pos.sameElements(0L until n), "pos is not a permutation of [0,n)")
  }

  test("epochOrder equals the naive global row_number formulation") {
    val docs = Tables.documents(spark, sfDir)
    val got = EpochShuffle.epochOrder(docs, "doc_id", epoch = 7)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val keyed = docs.select(col("doc_id"),
      EpochShuffle.epochKey(col("doc_id"), 7).as("k"))
    val naive = keyed.withColumn("pos",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k"), col("doc_id"))).cast("long") - 1L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == naive)
  }

  test("order is reproducible across partitionings, distinct across epochs") {
    val docs = Tables.documents(spark, sfDir)
    def run(df: org.apache.spark.sql.DataFrame, epoch: Int) =
      EpochShuffle.epochOrder(df, "doc_id", epoch)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val a = run(docs, 5)
    val b = run(docs.repartition(13), 5)
    assert(a == b, "same epoch must order identically on any partitioning")
    val c = run(docs, 6)
    assert(a != c, "different epochs should induce different orders")
    // and not a trivially shifted order: successor pairs must mostly change
    val byPosA = a.map(_.swap)
    val byPosC = c.map(_.swap)
    val succA = (0L until (a.size - 1).toLong)
      .map(p => byPosA(p) -> byPosA(p + 1)).toSet
    val succC = (0L until (c.size - 1).toLong)
      .map(p => byPosC(p) -> byPosC(p + 1)).toSet
    assert((succA intersect succC).size < a.size / 2,
      "epoch 6 order is near-identical to epoch 5 — scramble too weak")
  }

  test("null ids are dropped; the data-sized window is bucket-partitioned") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None, Some(3L)).toDF("id")
    val out = EpochShuffle.epochOrder(df, "id", epoch = 1)
    assert(out.count() == 3)
    val pos = out.select("pos").collect().map(_.getLong(0)).sorted
    assert(pos.sameElements(0L until 3L))
    // the only unpartitioned window runs over the ≤ nBuckets offsets frame:
    // the plan's data-path window must carry the __bucket partition spec
    val plan = EpochShuffle.epochOrder(
      Tables.documents(spark, sfDir), "doc_id", epoch = 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(__bucket"),
      s"data window not partitioned by bucket:\n$plan")
  }
}
