package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization of the event stream.
  *
  * Two implementations with identical semantics:
  *
  *   - [[sessionWindows]] — Spark's native `session_window` aggregation.
  *     Declarative, identical code path for batch and streaming frames,
  *     oracle-checkable in SQL (lag/cumsum formulation). Preferred.
  *   - [[sessionizeStateful]] — explicit `flatMapGroupsWithState` with
  *     event-time timeout, for session logic the built-in gap window can't
  *     express (per-event custom merging, early emission, enrichment).
  *     Sessions are emitted when the event-time watermark passes
  *     last-event + gap.
  *
  * Scale shape: both are one exchange keyed by user_id; state (stateful
  * path) or partial session aggregates (native path) are bounded per key by
  * the watermark, so memory is O(active sessions), not O(stream length).
  */
object Sessionize {

  /** (user_id, session_start_us, n_events, value_c) per gap-session.
    * Timestamps ride as epoch-µs longs and values as integer cents so the
    * result hash-matches a DuckDB lag/cumsum oracle exactly. */
  def sessionWindows(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("value_c"))

  /** One event as seen by the stateful path (ts kept as a timestamp so the
    * watermark column survives into the typed Dataset). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)

  /** Open-session accumulator carried in GroupState. */
  case class SessionState(startUs: Long, lastUs: Long, n: Long, valueC: Long)

  /** Emitted session summary (schema matches [[sessionWindows]]). */
  case class SessionOut(user_id: Long, session_start_us: Long,
                        n_events: Long, value_c: Long)

  /** Explicit stateful sessionization. `events` must carry user_id, ts
    * (timestamp), value; watermark is applied here. Each micro-batch's
    * events for a key are sorted in memory (bounded by per-trigger per-key
    * volume); sessions close via event-time timeout at last-event + gap. */
  def sessionizeStateful(spark: SparkSession, events: DataFrame,
                         gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(key: Long, rows: Iterator[Ev],
               state: GroupState[SessionState]): Iterator[SessionOut] = {
      def emit(s: SessionState) = SessionOut(key, s.startUs, s.n, s.valueC)
      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).toIterator
        state.remove()
        out
      } else {
        // HALF_UP both signs, matching Spark's round() in sessionWindows
        def cents(v: Double): Long = {
          val c = v * 100
          (if (c >= 0) math.floor(c + 0.5) else math.ceil(c - 0.5)).toLong
        }
        def micros(t: java.sql.Timestamp): Long =
          t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
        // sort by FULL µs precision — getTime alone is ms-grained and would
        // mis-order same-millisecond events, corrupting session_start_us
        val evs = rows.toSeq.sortBy(e => micros(e.ts))
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        evs.foreach { e =>
          val tsUs = micros(e.ts)
          cur match {
            case Some(s) if tsUs - s.lastUs < gapUs =>
              cur = Some(SessionState(s.startUs, tsUs, s.n + 1,
                s.valueC + cents(e.value)))
            case Some(s) =>
              closed ::= emit(s)
              cur = Some(SessionState(tsUs, tsUs, 1, cents(e.value)))
            case None =>
              cur = Some(SessionState(tsUs, tsUs, 1, cents(e.value)))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp((s.lastUs + gapUs) / 1000L) // ms
        }
        closed.reverseIterator
      }
    }

    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("value").cast("double").as("value"))
      .withWatermark("ts", "1 minute")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Per-batch PARTIAL sub-sessions — [[sessionWindows]] plus the last
    * event's timestamp (session_window.end is last + gap, so last_us is
    * an exact integer subtraction). The monitor-pattern half of streaming
    * sessionization: each microbatch sub-sessionizes only ITS OWN rows
    * (no state, no watermark race, no unflushed-open-session hole at end
    * of stream), and [[mergeSubSessions]] recovers the batch answer
    * exactly at read time. */
  def subSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        (unix_micros(col("session_window.end")) - gapUs).as("last_us"),
        col("n_events"), col("value_c"))
  }

  /** Gap-merge of sub-session intervals back into true sessions — equals
    * [[sessionWindows]] over the union of the underlying events for ANY
    * partition of those events into batches. Correctness argument: a
    * sub-session is a chain of globally-adjacent-within-gap events, so
    * true sessions are connected components over sub-sessions; walking a
    * key's sub-sessions in start order, a component break happens exactly
    * when start − max(previous lasts) ≥ gap — the RUNNING max, not
    * lag(last): an earlier-started sub-session may span past its
    * successors (the long-session-enveloping-a-short-batch case), and
    * its last is the one the next component tests against. Anything
    * between that max-last event and the next start would itself be an
    * earlier-started sub-session with a later last — contradiction — so
    * the two are globally consecutive and the gap test is the batch rule.
    * The window partitions per key over SUB-SESSION rows (bounded well
    * below events); aggregates are one map-side-combined groupBy. */
  def mergeSubSessions(subs: DataFrame, gapMinutes: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id")
      .orderBy(col("start_us"), col("last_us"))
    subs
      .withColumn("__pm", max("last_us").over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pm").isNull ||
          col("start_us") - col("__pm") >= gapUs, 1L).otherwise(0L))
      .withColumn("__sid", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "__sid")
      .agg(min("start_us").as("session_start_us"),
        sum("n_events").as("n_events"),
        sum("value_c").as("value_c"))
      .select("user_id", "session_start_us", "n_events", "value_c")
  }
}
