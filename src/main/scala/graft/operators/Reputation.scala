package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.textstats.TextStats

/** Per-host reputation rollup — the mixture-weight table a crawl pipeline
  * keeps per domain, fusing the three independent host signals this engine
  * already computes: link-graph endorsement ([[LinkGraph.pageRank]]),
  * content quality (the q23 heuristic score), and duplication burden
  * (exact-dup share). Hosts that are well-linked, high-quality and
  * dup-free get weight; link-farm mirrors lose on all three axes at once.
  *
  * All integer (the rows-76/102 rule): per-host mean quality is an
  * integer-floor of summed basis points, dup share is basis points by
  * integer division, and the fused score multiplies BEFORE each floor
  * division in a fixed order —
  *
  *   rep_u = ((pr_u · qmean_bp) div 10⁴) · (10⁴ − dup_bp) div 10⁴
  *
  * — so the rollup is engine- and partitioning-exact with no float
  * anywhere. Hosts absent from the link graph take the 150000 no-inlink
  * floor (exactly what one PageRank iteration would assign a node nobody
  * links to), so a host with zero graph presence is damped, not dropped.
  *
  * Scale notes: text NEVER shuffles — the exact-dup grouping runs on the
  * q25 content fingerprint computed at the scan (the (fp, id) shuffle
  * carries two longs per row; a cross-host collision in the 10⁹+7 space
  * is the documented, negligible risk, same family as q120's channels).
  * Both aggregates are map-side combined; the rank join is host-keyed and
  * host-bounded. */
object Reputation {

  /** (host, n_docs, qmean_bp, dup_bp, pr_u, rep_u) per distinct value of
    * `hostCol`. `pr` is a (node, pr) frame from [[LinkGraph.pageRank]]
    * over the matching host graph. */
  def hostReputation(docs: DataFrame, hostCol: String, idCol: String,
                     textCol: String, pr: DataFrame): DataFrame = {
    val base = docs.select(col(hostCol).as("host"), col(idCol).as("id"),
      TextStats.fingerprint(col(textCol)).as("fp"),
      TextStats.qualityScore(col(textCol)).as("q"))
    val keepers = base.groupBy("fp").agg(min("id").as("keep_id"))
    val flagged = base.join(keepers, Seq("fp"))
      .withColumn("is_dup", (col("id") =!= col("keep_id")).cast("long"))
    flagged.groupBy("host").agg(
        count(lit(1)).as("n_docs"),
        sum("q").as("q_sum"),
        sum("is_dup").as("n_dup"))
      .join(pr.select(col("node").as("host"), col("pr").as("pr_u")),
        Seq("host"), "left")
      .select(col("host"), col("n_docs"),
        expr("q_sum div n_docs").as("qmean_bp"),
        expr("(10000 * n_dup) div n_docs").as("dup_bp"),
        coalesce(col("pr_u"), lit(150000L)).as("pr_u"))
      .withColumn("rep_u",
        expr("((pr_u * qmean_bp) div 10000) * (10000 - dup_bp) div 10000"))
  }
}
