package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Strict-order event funnel: for each user, the earliest completion chain
  * step₁ → step₂ → … where each step's event is STRICTLY after the chosen
  * event of the previous step — the classic product-analytics funnel
  * (signup flows, checkout conversion), and the event-sequence shape a
  * behavioral-data curation pass labels sessions with.
  *
  * Semantics, stated honestly: "earliest next after earliest previous".
  * A user who did step₂ only BEFORE their earliest step₁ does not convert
  * (that is the funnel contract, not a bug), and ties (equal timestamps)
  * do not advance the chain — strictly greater, so duplicate-timestamp
  * feeds can't fake conversions. This matches the standard SQL N-join
  * formulation, which is exactly what the DuckDB oracle replays.
  *
  * Scale shape: one filtered partial aggregation per step plus
  * (steps−1) equi-joins on the user key — never a per-user event array on
  * the heap (the collect-and-walk formulation), never a rank window over
  * the whole event stream. Each step's frame only contains users that
  * reached the previous step, so the joined side shrinks monotonically and
  * AQE picks broadcast vs shuffle per step as the funnel narrows.
  */
object Funnel {

  /** Returns one row per user that performed step₁:
    * (userCol, t1_us .. tN_us: nullable long microseconds, depth: int). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, s"duplicate steps: $steps")
    // NULL users are excluded (the Transitions/Attribution/Retention
    // identity rule): groupBy would otherwise collapse every null-user
    // event into one phantom funnel entrant
    val first = events.filter(col(typeCol) === steps.head &&
        col(userCol).isNotNull)
      .groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("t1_us"))
    val n = steps.size
    val full = steps.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (step, i)) =>
        val prev = s"t${i}_us"
        val cur = s"t${i + 1}_us"
        val nxt = events.filter(col(typeCol) === step)
          .select(col(userCol), unix_micros(col(tsCol)).as("__ts"))
        // left join keeps stalled users; `__ts > null` is null, so a user
        // who never reached step i can never gain step i+1
        val keys = col(userCol) +: (1 to i).map(j => col(s"t${j}_us"))
        acc.join(nxt, Seq(userCol), "left")
          .groupBy(keys: _*)
          .agg(min(when(col("__ts") > col(prev), col("__ts"))).as(cur))
    }
    full.withColumn("depth",
      (1 to n).map(j => when(col(s"t${j}_us").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int"))
  }
}
