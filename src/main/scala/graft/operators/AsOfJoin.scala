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
  *
  * Skew limits: null-key/null-ts left rows bypass the exchange entirely
  * (they can never match), so a null-heavy feed costs nothing. A
  * pathologically hot NON-null key still serializes its window in one task
  * — the running-state window is order-dependent, so it cannot be salted
  * without a per-salt merge pass; callers with one dominant key should
  * pre-split it (e.g. by time range) and union the results.
  */
object AsOfJoin {

  private val reservedCols = Set("__k", "__t", "__tag", "__rv", "__l", "__match")

  /** col() parses dots as struct-field paths — user column names must be
    * backtick-quoted (with embedded backticks doubled) to be taken verbatim. */
  private def qcol(name: String) = col("`" + name.replace("`", "``") + "`")

  def asOfJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               rightValueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val clash = (rightValueCols.toSet & leftCols.toSet) ++
      ((rightValueCols.toSet ++ leftCols.toSet) & reservedCols)
    require(clash.isEmpty,
      s"column names collide (left vs rightValueCols, or with the " +
        s"operator-internal $reservedCols names): $clash — alias them first")
    val rv = struct(rightValueCols.map(qcol): _*)
    val rvType = right.select(rv).schema.head.dataType
    val lRow = struct(leftCols.map(qcol): _*)
    // join semantics: a null key or null timestamp can match nothing on
    // EITHER side. Null right rows are dropped (NULLS FIRST would otherwise
    // carry a null-ts payload forward as "before everything"). Null LEFT
    // rows still emit unmatched — but they bypass the key exchange entirely:
    // partitionBy(null-key) would funnel every null-key row into ONE task,
    // so a null-heavy feed serializes; the bypass branch keeps them a
    // map-only union leg instead.
    val matchable = qcol(leftKey).isNotNull && qcol(leftTs).isNotNull
    val lSide = left.filter(matchable).select(
      qcol(leftKey).as("__k"), qcol(leftTs).as("__t"), lit(1).as("__tag"),
      lit(null).cast(rvType).as("__rv"), lRow.as("__l"))
    val rSide = right
      .filter(qcol(rightKey).isNotNull && qcol(rightTs).isNotNull)
      .select(
        qcol(rightKey).as("__k"), qcol(rightTs).as("__t"), lit(0).as("__tag"),
        rv.as("__rv"), lit(null).cast(lSide.schema("__l").dataType).as("__l"))
    // right rows sort before left rows at the same timestamp -> inclusive.
    // getField (not col("__l.name")): a dotted left column name must not be
    // parsed as a nested-field path.
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = lSide.unionByName(rSide)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(leftCols.map(c => col("__l").getField(c).as(c)) ++
        rightValueCols.map(c => col("__match").getField(c).as(c)): _*)
    val bypass = left.filter(!matchable)
      .select(leftCols.map(qcol) ++
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    joined.unionByName(bypass)
  }
}
