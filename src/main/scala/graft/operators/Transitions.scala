package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-type transition matrix — the first-order Markov census of user
  * journeys (click→purchase, error→abandon): for every adjacent pair of a
  * user's events in (ts, id) order, count (from, to) occurrences and each
  * from-type's outgoing share in basis points. The product-analytics
  * companion to the strict-order [[Funnel]] (which checks ONE prescribed
  * path; this measures ALL observed paths) and the input to journey
  * simulation / next-event prediction baselines.
  *
  * Exactness: the successor comes from `lead` over the per-user (ts, id)
  * TOTAL order — deterministic under timestamp ties — and the share is one
  * integer `div` per (from, to) row, so the matrix replays bit-for-bit.
  *
  * Scale shape: the lead window partitions by user — state is one user's
  * events, never the stream (the [[graft.streaming.Sessionize]] argument);
  * the shuffle carries (user, ts, id, type) only; the two count
  * aggregates are map-side combined and bounded by |types|².
  * Null user/ts/type rows are excluded (no identity / no order / no
  * state — the EpochShuffle null contract).
  *
  * [[pairsStream]] is the live twin in the [[Debounce.debounceStream]]
  * idiom: one last-event record of GroupState per user continues the
  * adjacency chain across triggers, so the drained pair multiset equals
  * the batch pairs whenever each user's events arrive in event-time
  * order across triggers (within a trigger the key's batch is sorted; the
  * order-sensitivity across triggers is the same honest contract q88
  * states). [[rollup]] over the drained pairs then IS the batch matrix.
  */
object Transitions {

  /** (from_type, to_type) pair frame → (from_type, to_type, n, out_bp).
    * The outgoing total is a window over the COUNTS frame (≤ |types|²
    * rows), not a self-join — one aggregate, no relation dedup hazards. */
  def rollup(pairs: DataFrame): DataFrame =
    pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("__tot",
        sum("n").over(Window.partitionBy("from_type")))
      .withColumn("out_bp", expr("(10000 * n) div __tot"))
      .drop("__tot")

  /** (from_type, to_type, n, out_bp) over an event frame. */
  def matrix(events: DataFrame, userCol: String, tsCol: String,
             idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("__u").orderBy(col("__t"), col("__id"))
    // idCol joins the null screen: it is the (ts, id) tie-break, and a
    // NULL id under a timestamp tie is NOT a cross-engine total order
    // (Spark windows sort NULLs first asc, DuckDB last) — the bit-exact
    // replay claim needs every order key non-null
    val pairs = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull && col(idCol).isNotNull)
      .select(col(userCol).as("__u"),
        expr(s"unix_micros($tsCol)").as("__t"),
        col(idCol).as("__id"), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    rollup(pairs)
  }

  /** One event as seen by the streaming path (µs epoch, pre-projected). */
  case class TEv(user_id: Long, event_type: String, ts_us: Long,
                 event_id: Long)

  /** Last seen event of a user (the chain head carried across triggers). */
  case class TLast(ts_us: Long, event_id: Long, event_type: String)

  /** An adjacency pair emitted by the stream. */
  case class TPair(from_type: String, to_type: String)

  /** Streaming adjacency pairs: per user, each arriving event pairs with
    * the previous one (from GroupState across triggers, from the sorted
    * batch within one). State is one (ts, id, type) record per live user,
    * NoTimeout here — production hangs a ProcessingTimeTimeout on it to
    * shed dead users. Same per-trigger heap bound as debounceStream:
    * one key's trigger batch is sorted in memory. */
  def pairsStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    def update(key: Long, rows: Iterator[TEv],
               state: GroupState[TLast]): Iterator[TPair] = {
      var prev = state.getOption
      val out = Seq.newBuilder[TPair]
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        prev.foreach(p => out += TPair(p.event_type, e.event_type))
        prev = Some(TLast(e.ts_us, e.event_id, e.event_type))
      }
      prev.foreach(state.update)
      out.result().iterator
    }
    events.as[TEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
