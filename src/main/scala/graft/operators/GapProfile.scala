package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Inter-arrival gap profile — the bot/automation screen over an event
  * log: a human's gaps between consecutive actions spread across many
  * log₂ buckets, a scripted client's concentrate in one or two (constant
  * polling intervals, retry loops). Per key: gap count, distinct gap
  * buckets, the dominant bucket's share in basis points, and the
  * concentration flag share ≥ threshold — the inter-arrival analog of
  * row 62's repetition screen.
  *
  * Buckets are floor(log₂ gap_µs) computed as length(bin(gap)) − 1 —
  * an INTEGER identity on both engines (no float log whose rounding
  * could flip a boundary); gap = 0 (same-µs events) lands in bucket 0.
  *
  * Scale shape: the lag window partitions by key ((ts, id)-ordered, the
  * Transitions shape); the two aggregates are map-side combined and
  * bounded by keys × 64 buckets; the dominant share comes from a window
  * over the per-key BUCKET frame (≤ 64 rows per key), never the events.
  * Keys with no gap (single event) don't appear.
  */
object GapProfile {

  def profile(events: DataFrame, keyCol: String, tsCol: String,
              idCol: String, dominantBp: Int = 8000): DataFrame = {
    val wLag = Window.partitionBy("key").orderBy(col("__t"), col("__id"))
    val gaps = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("key"),
        expr(s"unix_micros($tsCol)").as("__t"), col(idCol).as("__id"))
      .withColumn("__prev", lag(col("__t"), 1).over(wLag))
      .filter(col("__prev").isNotNull)
      .withColumn("__bucket",
        (length(bin(col("__t") - col("__prev"))) - 1).cast("long"))
    profileFromBuckets(gaps.select(col("key"), col("__bucket")), dominantBp)
  }

  /** The report half over a (key, __bucket) gap frame — shared by the
    * batch path and the streaming monitor's read side (gap-bucket rows
    * are ADDITIVE across microbatches, so the rollup over the drained
    * rows equals the batch profile exactly under in-order arrival). */
  def profileFromBuckets(gapBuckets: DataFrame,
                         dominantBp: Int = 8000): DataFrame = {
    val perBucket = gapBuckets.groupBy("key", "__bucket")
      .agg(count(lit(1)).as("__bn"))
    val wKey = Window.partitionBy("key")
    val wTop = Window.partitionBy("key")
      .orderBy(col("__bn").desc, col("__bucket").asc)
    perBucket
      .withColumn("__tot", sum("__bn").over(wKey))
      .withColumn("__nb", count(lit(1)).over(wKey))
      .withColumn("__rk", row_number().over(wTop))
      .filter(col("__rk") === 1)
      .select(col("key"), col("__tot").as("n_gaps"),
        col("__nb").as("n_buckets"),
        col("__bucket").as("top_bucket"),
        expr("(10000 * __bn) div __tot").as("top_share_bp"))
      .withColumn("concentrated",
        (col("top_share_bp") >= dominantBp).cast("long"))
  }

  /** One event as seen by the streaming path. */
  case class GEv(user_id: Long, ts_us: Long, event_id: Long)

  /** A gap bucket emitted by the stream. */
  case class GBucket(key: Long, __bucket: Long)

  /** Streaming gap buckets: per key, each arriving event emits the log₂
    * bucket of its gap to the previous one — last timestamp carried as
    * one Long of GroupState across triggers (the q88/q204 idiom and its
    * in-order contract; equal-ts order within a trigger cannot change any
    * bucket, every same-ts gap is 0). Feed [[profileFromBuckets]] with
    * the drained rows for the exact batch profile. */
  def bucketsStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    def update(key: Long, rows: Iterator[GEv],
               state: GroupState[Long]): Iterator[GBucket] = {
      var last = state.getOption.getOrElse(Long.MinValue)
      val out = Seq.newBuilder[GBucket]
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (last != Long.MinValue) {
          val gap = e.ts_us - last
          // floor(log2 gap) for gap >= 1; gap 0 -> bucket 0 — the exact
          // length(bin(gap)) - 1 identity of the batch path
          val bucket =
            if (gap <= 0L) 0L
            else (63 - java.lang.Long.numberOfLeadingZeros(gap)).toLong
          out += GBucket(key, bucket)
        }
        last = e.ts_us
      }
      state.update(last)
      out.result().iterator
    }
    events.as[GEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
      .toDF()
  }
}
