package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal follow matrix — for every ordered pair of event types, how
  * often does a B follow an A within Δt for the same user: the
  * sequence-correlation read behind alerting ("errors follow deploy
  * clicks"), journey design, and next-event-prediction label rates.
  * Complements row 197's transition matrix, which only sees IMMEDIATELY
  * adjacent pairs — a follow within the window counts here even with
  * other events between.
  *
  * follow_bp = 10000 · |A events with ≥1 B strictly after them within
  * Δt| div |A events| — an indicator per A event (multiple Bs count
  * once), strict `>` so same-instant events never follow themselves.
  * Pairs with zero follows are absent (their rate is 0 and the matrix
  * stays sparse); same-type pairs (A followed by another A) are
  * legitimate rows.
  *
  * Shape: one hash equi self-join ON USER with the window predicate in
  * the join filter — per-user work bounded by in-window event density
  * (the row-239 bound; a Δt-window of a single user's events, not the
  * stream) — then one countDistinct per type pair over the ≤ |types|²
  * frame and a hash join of per-type totals. Never a cross-user join.
  */
object Follow {

  /** (type_a, type_b, n_a, n_followed, follow_bp). */
  def followMatrix(events: DataFrame, userCol: String, tsCol: String,
                   idCol: String, typeCol: String,
                   windowUs: Long): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(idCol).as("eid"), col(userCol).as("u"),
        col(typeCol).as("ty"), expr(s"unix_micros($tsCol)").as("t_us"))
    val followed = e.as("a")
      .join(e.as("b"), col("a.u") === col("b.u") &&
        col("b.t_us") > col("a.t_us") &&
        col("b.t_us") - col("a.t_us") <= windowUs)
      .groupBy(col("a.ty").as("type_a"), col("b.ty").as("type_b"))
      .agg(countDistinct(col("a.eid")).as("n_followed"))
    val totals = e.groupBy(col("ty").as("type_a"))
      .agg(count(lit(1)).as("n_a"))
    followed.join(totals, Seq("type_a"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_followed"),
        expr("(10000 * n_followed) div n_a").as("follow_bp"))
  }
}
