package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top session paths — the "what do user journeys actually look like"
  * read: each gap-session's first `maxSteps` event types joined into an
  * ordered path string, counted, top-k'd. Complements row 197's
  * transition matrix (bigram rates can't distinguish A→B→C from A→B and
  * B→C in different sessions) and row 99's funnel (which checks ONE
  * declared order; this discovers the orders that exist).
  *
  * Shape: sessions come from the row-42 lag/cumsum rule (per-key
  * windows); each event gets its in-session rank and rows beyond
  * `maxSteps` are DROPPED BEFORE collection, so the per-session
  * collect_list is bounded at maxSteps structs — never an unbounded
  * session in memory; struct array_sort on (rank, type) makes the join
  * order deterministic. Path counting is one map-side-combined groupBy
  * on the path string; top-k is orderBy+limit — TakeOrdered on the
  * (n desc, path asc) total order, never a full sort shuffle.
  */
object Paths {

  /** (path, n_sessions) for the k most common session paths; ties break
    * lexicographically on the path. */
  def topSessionPaths(events: DataFrame, userCol: String, tsCol: String,
                      tieCol: String, typeCol: String,
                      gapMinutes: Int = 60, maxSteps: Int = 8,
                      k: Int = 20): DataFrame = {
    require(gapMinutes > 0 && maxSteps >= 1 && k >= 1,
      "gapMinutes, maxSteps and k must be positive")
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("u").orderBy(col("t_us"), col("tie"))
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(userCol).as("u"), expr(s"unix_micros($tsCol)").as("t_us"),
        col(tieCol).as("tie"), col(typeCol).as("ty"))
    e.withColumn("__new",
        when(col("t_us") - lag(col("t_us"), 1).over(w) < gapUs, 0L)
          .otherwise(1L))
      .withColumn("__sid", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("u", "__sid").orderBy(col("t_us"), col("tie"))))
      .filter(col("__rn") <= maxSteps)
      .groupBy("u", "__sid")
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(__rn, ty))), x -> x.ty), '>')").as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(desc("n_sessions"), asc("path"))
      .limit(k)
  }
}
