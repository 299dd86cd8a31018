package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key cooldown dedup (debounce/throttle): scanning each key's events
  * in (ts, tie-breaker) order, an event is kept iff it is at least
  * `cooldown` after the LAST KEPT event of that key; the first event of a
  * key is always kept. This is the ingest-side rate limiter for event
  * streams (duplicate webhook deliveries, retry storms, bot bursts) — and
  * it is NOT a window function: whether an event survives depends on the
  * kept-chain, not on its lag to the previous event, so `lag()` cannot
  * express it and neither can any fixed-frame window.
  *
  * Execution shape, 100 TB-minded: one hash repartition on the key columns
  * and a sortWithinPartitions (Tungsten external sort — spills, never
  * OOMs) put each key's events contiguous and ordered; a single forward
  * scan with O(1) state (current key, last kept ts) then filters the run.
  * No per-key arrays are materialized, no corpus-wide window, and hot keys
  * cost sort time, not memory. This is the classic secondary-sort pattern;
  * mapPartitions here is the declared per-partition imperative step, like
  * the multimodal codecs.
  *
  * [[debounceStream]] is the streaming twin, in
  * [[graft.streaming.Sessionize]]'s flatMapGroupsWithState idiom: GroupState
  * holds the same single last-kept-ts long per key.
  */
object Debounce {

  /** Filter `events` to the kept chain. `tsCol` must be an integral epoch
    * column (µs here; any unit works as long as `cooldown` matches) with
    * no nulls — pre-filter null keys/timestamps, they have no defined
    * position in the chain. `tieCol` breaks equal-timestamp ties so the
    * kept set is a pure function of the data, not of partitioning. Equal-ts
    * events after a kept one are dropped (their gap is 0 < cooldown). */
  def debounce(events: DataFrame, keyCols: Seq[String], tsCol: String,
               tieCol: String, cooldown: Long): DataFrame = {
    require(keyCols.nonEmpty, "debounce needs at least one key column")
    require(cooldown > 0, s"cooldown must be positive, got $cooldown")
    require(events.schema(tsCol).dataType ==
        org.apache.spark.sql.types.LongType,
      s"debounce requires a LongType epoch column (the scan reads longs); " +
        s"got ${events.schema(tsCol).dataType.simpleString} — cast first")
    val sorted = events
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions(
        (keyCols.map(col) :+ col(tsCol) :+ col(tieCol)): _*)
    val schema = sorted.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex(tsCol)
    implicit val enc = Encoders.row(schema)
    sorted.mapPartitions { it =>
      // keys are contiguous within the partition (the sort leads with the
      // key columns), so one (key, lastKept) register is the whole state
      var curKey: Seq[Any] = null
      var lastKept = 0L
      it.filter { r =>
        val k = keyIdx.map(r.get)
        val ts = r.getLong(tsIdx)
        if (k != curKey) { curKey = k; lastKept = ts; true }
        else if (ts - lastKept >= cooldown) { lastKept = ts; true }
        else false
      }
    }
  }

  /** One event as seen by the streaming path (µs epoch, pre-projected). */
  case class DEv(user_id: Long, event_type: String, ts_us: Long,
                 event_id: Long)

  /** Streaming debounce: the same kept-chain, with the last-kept timestamp
    * as one Long of GroupState per (user, type) key. Within a trigger the
    * key's batch is sorted by (ts, id); across triggers the chain continues
    * from state — equal to the batch result whenever each key's events
    * arrive in event-time order across triggers (the kept-chain is
    * order-sensitive by definition, so out-of-order late data would need a
    * watermark-deep reorder buffer in front; stated honestly rather than
    * pretended away). State is 8 bytes per live key, NoTimeout here —
    * production hangs a ProcessingTimeTimeout on it to shed dead keys.
    * Memory bound, also stated honestly: each TRIGGER buffers one key's
    * batch on the heap to sort it (unlike the batch twin's external
    * sort) — fine for steady streams, but an AvailableNow catch-up run
    * over a hot key's full history belongs on [[debounce]] instead. */
  def debounceStream(spark: SparkSession, events: DataFrame,
                     cooldown: Long): DataFrame = {
    import spark.implicits._
    def update(key: (Long, String), rows: Iterator[DEv],
               state: GroupState[Long]): Iterator[DEv] = {
      var last = state.getOption.getOrElse(Long.MinValue)
      val kept = rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).filter { e =>
        if (last == Long.MinValue || e.ts_us - last >= cooldown) {
          last = e.ts_us; true
        } else false
      }
      if (last != Long.MinValue) state.update(last)
      kept.iterator
    }
    events.as[DEv]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
