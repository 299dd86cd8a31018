package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks the right row with the greatest
  * `rightTs` ≤ its `leftTs` within the same key — the temporal-enrichment
  * join (trades⋈quotes, event⋈latest-state) that Spark has no native
  * operator for.
  *
  * Implementation is the scalable union-tag formulation, NOT a range join:
  * both sides are unioned into one (key, ts, tag, payload) stream, hashed
  * by key and sorted by (ts, tag) within each key, and a running
  * `last(payload, ignoreNulls)` window carries the most recent right-side
  * payload forward onto each left row. Cost: ONE exchange keyed by the join
  * key + one per-key sort — the same shape as a sort-merge join — versus
  * the O(|L|·|R|) blowup of the naive `l.ts >= r.ts` theta-join (which
  * Spark would plan as a broadcast-nested-loop or cartesian). Ties: a right
  * row AT the left row's timestamp matches (inclusive); callers must make
  * (key, ts) unique on the right side (e.g. keep the max-id row) for a
  * deterministic pick among same-timestamp right rows.
  *
  * Returns every left row (left-outer semantics) with `rightValueCols`
  * appended, null when no right row precedes it.
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val clash = rightValueCols.toSet & leftCols.toSet
    require(clash.isEmpty,
      s"rightValueCols collide with left columns: $clash — alias them first")
    val rv = struct(rightValueCols.map(col): _*)
    val rvType = right.select(rv).schema.head.dataType
    val lSide = left.select(
      col(leftKey).as("__k"), col(leftTs).as("__t"), lit(1).as("__tag"),
      lit(null).cast(rvType).as("__rv"), struct(leftCols.map(col): _*).as("__l"))
    // join semantics: a null key or null timestamp on the right can match
    // nothing (NULLS FIRST would otherwise carry a null-ts payload forward
    // as "before everything"); null-key/ts LEFT rows still emit, unmatched
    val rSide = right
      .filter(col(rightKey).isNotNull && col(rightTs).isNotNull)
      .select(
        col(rightKey).as("__k"), col(rightTs).as("__t"), lit(0).as("__tag"),
        rv.as("__rv"), lit(null).cast(lSide.schema("__l").dataType).as("__l"))
    // right rows sort before left rows at the same timestamp -> inclusive
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lSide.unionByName(rSide)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightValueCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
