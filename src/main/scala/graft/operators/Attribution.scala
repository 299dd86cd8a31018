package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Last-touch conversion attribution — every conversion event is credited
  * to the user's LATEST preceding touch event within a lookback window
  * (the marketing-analytics staple, and the label-construction step for
  * conversion-prediction training data: "which click caused this
  * purchase"). Conversions with no in-window touch stay unattributed with
  * a NULL touch id — dropping them would bias any downstream rate.
  *
  * Built on the [[AsOfJoin]] union-tag machinery (one key exchange + one
  * per-key sort, never a per-user theta-join): touches are deduplicated to
  * max-id per (user, µs) first — the q33 determinism contract — then the
  * as-of pick runs, then the lookback window is enforced as a post-filter
  * that NULLs out stale touches (an out-of-window touch must not surface).
  * A touch AT the conversion's exact microsecond matches (inclusive, the
  * as-of tie rule), documented.
  *
  * Exactness: timestamps ride as epoch-µs longs end-to-end; ages are
  * integer differences; the attributed flag is 0/1. Everything replays in
  * SQL as the latest-preceding-row window pick.
  */
object Attribution {

  /** One row per conversion event: (conversion_id, user_id, t_us,
    * touch_id, age_us, attributed). `touch_id`/`age_us` are NULL when no
    * touch of `touchType` precedes the conversion within `windowUs`. */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
                idCol: String, typeCol: String,
                convType: String, touchType: String,
                windowUs: Long): DataFrame = {
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("eid"), col(userCol).as("u"),
        col(typeCol).as("ty"), expr(s"unix_micros($tsCol)").as("t_us"))
    val touches = e.filter(col("ty") === touchType)
      .groupBy(col("u"), col("t_us").as("tt_us"))
      .agg(max("eid").as("touch"))
    val convs = e.filter(col("ty") === convType)
      .select(col("eid").as("conversion_id"), col("u"), col("t_us"))
    val joined = AsOfJoin.asOfJoin(convs, touches,
      "u", "u", "t_us", "tt_us", Seq("touch", "tt_us"))
    val inWindow = col("tt_us").isNotNull &&
      (col("t_us") - col("tt_us")) <= windowUs
    joined.select(
      col("conversion_id"), col("u").as("user_id"),
      col("t_us"),
      when(inWindow, col("touch")).as("touch_id"),
      when(inWindow, col("t_us") - col("tt_us")).as("age_us"),
      when(inWindow, lit(1L)).otherwise(lit(0L)).as("attributed"))
  }

  /** Position-based (U-shaped) multi-touch attribution — the standard
    * 40/20/40 complement to [[lastTouch]]: EVERY in-window touch of a
    * conversion gets credit, 40% to the first, 40% to the last, the
    * middle 20% split across interior touches. Credits are exact integer
    * basis points summing to 10000 per attributed conversion: n=1 →
    * 10000, n=2 → 5000/5000, n≥3 → last 4000, interiors 2000 div (n−2)
    * each, first 4000 + the division remainder (2000 % (n−2)) — the
    * deterministic remainder rule, documented not hidden.
    *
    * Shape: touches dedupe to max-id per (user, µs) — the q33 contract —
    * then ONE hash equi-join on user with the window predicate as the
    * join filter; per-conversion count/row_number windows partition by
    * conversion id, frames bounded by that conversion's in-window touch
    * count (lookback-bounded by construction). Unattributed conversions
    * (no in-window touch) are absent here — [[lastTouch]] is the
    * rate-honest report; this is the credit ledger. */
  def positionCredit(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String, typeCol: String,
                     convType: String, touchType: String,
                     windowUs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol).as("eid"), col(userCol).as("u"),
        col(typeCol).as("ty"), expr(s"unix_micros($tsCol)").as("t_us"))
    val touches = e.filter(col("ty") === touchType)
      .groupBy(col("u"), col("t_us").as("tt_us"))
      .agg(max("eid").as("touch"))
    val convs = e.filter(col("ty") === convType)
      .select(col("eid").as("conversion_id"), col("u"), col("t_us"))
    val joined = convs.join(touches, Seq("u"))
      .filter(col("tt_us") <= col("t_us") &&
        col("t_us") - col("tt_us") <= windowUs)
    val w = Window.partitionBy("conversion_id")
    val wo = w.orderBy(col("tt_us"), col("touch"))
    joined
      .withColumn("n_touches", count(lit(1)).over(w))
      .withColumn("position", row_number().over(wo))
      .withColumn("credit_bp",
        when(col("n_touches") === 1, lit(10000L))
          .when(col("n_touches") === 2, lit(5000L))
          .when(col("position") === 1,
            lit(4000L) + expr("2000 % (n_touches - 2)"))
          .when(col("position") === col("n_touches"), lit(4000L))
          .otherwise(expr("2000 div (n_touches - 2)")))
      .select(col("conversion_id"), col("u").as("user_id"),
        col("touch").as("touch_id"), col("position"),
        col("n_touches"), col("credit_bp"))
  }

  /** One event as seen by the streaming path (µs epoch, pre-projected). */
  case class AEv(user_id: Long, event_type: String, ts_us: Long,
                 event_id: Long)

  /** Latest touch of a user (carried across triggers). */
  case class ATouch(ts_us: Long, event_id: Long)

  /** An attribution verdict emitted by the stream (same columns as the
    * batch [[lastTouch]]). */
  case class AOut(conversion_id: Long, user_id: Long, t_us: Long,
                  touch_id: Option[Long], age_us: Option[Long],
                  attributed: Long)

  /** Streaming last-touch attribution — conversions credited IN-FLIGHT:
    * one latest-touch (ts, id) record of GroupState per user; within a
    * trigger the key's batch sorts by (ts, touch-before-conversion, id),
    * which reproduces the batch tie rules exactly — a touch AT the
    * conversion's µs matches (inclusive), and among same-µs touches the
    * max id wins because later ids overwrite. Drain == batch whenever
    * each user's events arrive in event-time order across triggers (the
    * q88/q204 contract; an equal-µs touch arriving a trigger AFTER its
    * conversion is the documented tie edge). Rows of other event types
    * are filtered before the state operator — they neither touch state
    * nor emit. */
  def lastTouchStream(spark: SparkSession, events: DataFrame,
                      convType: String, touchType: String,
                      windowUs: Long): DataFrame = {
    import spark.implicits._
    def update(u: Long, rows: Iterator[AEv],
               state: GroupState[ATouch]): Iterator[AOut] = {
      var last = state.getOption
      val out = Seq.newBuilder[AOut]
      rows.toSeq
        .sortBy(e => (e.ts_us, if (e.event_type == touchType) 0 else 1,
          e.event_id))
        .foreach { e =>
          if (e.event_type == touchType)
            last = Some(ATouch(e.ts_us, e.event_id))
          else {
            // l.ts_us <= e.ts_us: a state touch LATER than the conversion
            // (out-of-order arrival across triggers) must not attribute
            // backwards with a negative age — the batch as-of join can
            // never credit a future touch
            val inw = last.exists(l =>
              l.ts_us <= e.ts_us && e.ts_us - l.ts_us <= windowUs)
            out += AOut(e.event_id, u, e.ts_us,
              if (inw) last.map(_.event_id) else None,
              if (inw) last.map(e.ts_us - _.ts_us) else None,
              if (inw) 1L else 0L)
          }
        }
      last.foreach(state.update)
      out.result().iterator
    }
    events.as[AEv]
      .filter(e => e.event_type == convType || e.event_type == touchType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
