package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union coverage per key: each event opens a half-open activity
  * interval [ts, ts + width); overlapping or touching intervals of the
  * same key merge, and the key's coverage is the number of merged segments
  * and their total length — dwell time, "minutes active", sensor-uptime
  * style measures that raw event counts misstate badly under bursts
  * (100 events in one minute is one minute of activity, not 100).
  *
  * The classic sweep: order a key's intervals by start, a new segment
  * begins exactly where the running max of interval ends stays behind the
  * next start. Both window passes are PER-KEY (partitionBy user) — state
  * is one key's rows, not the stream — and the two follow-up aggregations
  * reuse the window's hash partitioning, so the whole operator costs ONE
  * exchange. Caveat at 100 TB: a single pathologically hot key serializes
  * its own sort (true of any formulation of an order-dependent sweep);
  * pre-split such keys by day/session before merging if one key can carry
  * billions of events.
  */
object Intervals {

  /** (keyCols..., n_segments, covered) with `covered` in the ts column's
    * unit. `tsCol` must be integral (epoch µs here); ties and duplicate
    * timestamps are fine (equal intervals merge). Null keys/timestamps
    * must be pre-filtered — they have no position on the line. */
  def coverage(events: DataFrame, keyCols: Seq[String], tsCol: String,
               width: Long): DataFrame = {
    require(keyCols.nonEmpty, "coverage needs at least one key column")
    require(width > 0, s"width must be positive, got $width")
    val keys = keyCols.map(col)
    val byKey = Window.partitionBy(keys: _*).orderBy(col("__s"))
    val prevMax = max(col("__e"))
      .over(byKey.rowsBetween(Window.unboundedPreceding, -1))
    val segId = sum(
      when(prevMax.isNull || col("__s") > prevMax, 1L).otherwise(0L))
      .over(byKey.rowsBetween(Window.unboundedPreceding, 0))
    events
      .select(keys :+ col(tsCol).as("__s") :+
        (col(tsCol) + lit(width)).as("__e"): _*)
      .withColumn("__seg", segId)
      .groupBy(keys :+ col("__seg"): _*)
      .agg(min(col("__s")).as("__ss"), max(col("__e")).as("__se"))
      .groupBy(keys: _*)
      .agg(count(lit(1)).as("n_segments"),
        sum(col("__se") - col("__ss")).as("covered"))
  }
}
