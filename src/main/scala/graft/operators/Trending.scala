package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-period trending items — the top-k items by count inside every
  * time period (trending search terms / products / error signatures per
  * day): the report every engagement dashboard and every "what changed
  * today" triage starts from.
  *
  * Scale shape: one map-side-combined (period, item) count bounded by
  * periods × items, then the row-51 map-side-capped typed top-k
  * aggregator per period — each partition ships at most k candidate
  * rows per period, and no per-period sort window ever sees the count
  * frame. Rank order is the (n desc, item asc) total order, so ties are
  * deterministic and the oracle replays row-for-row.
  */
object Trending {

  /** (period, item, n, rank ≤ k). */
  def topItemsPerPeriod(df: DataFrame, periodCol: String, itemCol: String,
                        k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df
      .filter(col(periodCol).isNotNull && col(itemCol).isNotNull)
      .groupBy(col(periodCol).cast("long").as("period"),
        col(itemCol).cast("string").as("item"))
      .agg(count(lit(1)).as("n"))
    val topk = new graft.functions.TopKStrAggregator(k).toColumn
    counts.as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, item, n) => (item, n) }
      .agg(topk.name("topk"))
      .toDF("period", "topk")
      .select(col("period"), posexplode(col("topk")))
      .select(col("period"), col("col._1").as("item"),
        col("col._2").as("n"), (col("pos") + 1).cast("int").as("rank"))
  }
}
