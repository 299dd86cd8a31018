package graft

import org.apache.spark.sql.functions._
import graft.operators.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed and drops the unchanged bulk") {
    val v1 = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "text")
    val v2 = Seq((1L, "a"), (2L, "B"), (5L, "e"), (4L, "d"))
      .toDF("id", "text")
    val got = SnapshotDiff.diff(v1, v2, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 5L -> "added"),
      s"got $got")
  }

  test("null vs empty text differ; null vs null is unchanged") {
    val v1 = Seq((1L, null: String), (2L, null: String)).toDF("id", "text")
    val v2 = Seq((1L, ""), (2L, null: String)).toDF("id", "text")
    val got = SnapshotDiff.diff(v1, v2, "id", Seq("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // concat_ws('|', NULL) = '' on both engines, so null == '' here BY
    // DESIGN of the encoding (a single nullable encode column cannot
    // distinguish them); the diff must at least be consistent: no row
    assert(got == Map.empty[Long, String], s"got $got")
  }

  test("identical frames diff to zero rows on real data; join is keyed") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val out = SnapshotDiff.diff(docs, docs, "doc_id", Seq("text", "lang"))
    assert(out.count() == 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"),
      s"expected a keyed equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("columnChanges: per-column null-safe counts over common keys " +
    "only; added/removed keys never contribute") {
    import spark.implicits._
    val v1 = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "s", "n")
    val v2 = Seq((1L, "a", 11L), (2L, null, 20L), (4L, "d", 40L))
      .toDF("k", "s", "n")
    val got = graft.operators.SnapshotDiff
      .columnChanges(v1, v2, "k", Seq("s", "n"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    // common keys {1, 2}: s changes on 2 (b→NULL), n changes on 1
    assert(got == Map("s" -> ((1L, 2L, 5000L)), "n" -> ((1L, 2L, 5000L))),
      got.toString)
  }

  test("releaseDelta: status decomposition with exact weight deltas; " +
    "the per-status deltas sum to the total change") {
    import spark.implicits._
    val v1 = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .toDF("k", "w")
    val v2 = Seq((1L, 10L), (2L, 25L), (5L, 50L)).toDF("k", "w")
    val got = graft.operators.SnapshotDiff.releaseDelta(v1, v2, "k", "w")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      "unchanged" -> ((1L, 10L, 10L, 0L)),
      "changed" -> ((1L, 20L, 25L, 5L)),
      "removed" -> ((2L, 70L, 0L, -70L)),
      "added" -> ((1L, 0L, 50L, 50L))), got.toString)
    assert(got.values.map(_._4).sum == 85L - 100L)
  }

  test("contentNovelty: re-keyed identical content is NOT novel; " +
    "changed content is; zero-novel groups kept") {
    import spark.implicits._
    val v1 = Seq((1L, "s1", "alpha"), (2L, "s1", "beta"),
      (3L, "s2", "gamma")).toDF("id", "src", "text")
    val v2 = Seq((11L, "s1", "alpha"), (12L, "s1", "NEW beta"),
      (13L, "s2", "gamma")).toDF("id", "src", "text")
    val got = graft.operators.SnapshotDiff
      .contentNovelty(v1, v2, "src", Seq("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map("s1" -> ((2L, 1L, 5000L)),
      "s2" -> ((1L, 0L, 0L))), got.toString)
  }
}
