package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** kNN pseudo-labeling (label propagation) over an embedding column: each
  * unlabeled vector takes the majority label among its k exact-cosine
  * nearest LABELED neighbors — the standard semi-supervised bootstrap for
  * growing a labeled training set from a small seed (and the evaluation
  * harness for embedding quality). Ties are deterministic end-to-end:
  * neighbor rank breaks on (cos DESC, id ASC) and the vote breaks on
  * (votes DESC, label ASC), so the output is reproducible across runs,
  * partitionings, and engines.
  *
  * Scale shape: this is [[Ann.bruteForceTopK]]'s plan — the query set
  * broadcasts onto the labeled scan, per-partition top-k caps each
  * partition's contribution BEFORE the exchange — plus two vote
  * aggregations over |queries|·k rows, which is query-set-sized, not
  * corpus-sized. The labeled corpus is never shuffled; the shortlist
  * (|queries|·k rows) broadcasts back onto the labeled scan to fetch
  * neighbor labels. For query sets too large to broadcast, substitute
  * [[Ann.lshTopK]] / the IVF probe as the neighbor stage — the voting
  * stages are unchanged.
  */
object KnnLabel {

  /** Returns (query_id, pred_label, votes): majority label among the k
    * nearest labeled neighbors of each query row. `isQuery` splits `emb`
    * into the query set (scored) and the labeled set (voted); the two are
    * disjoint by construction so self-matches cannot occur.
    *
    * The |queries|·k shortlist is count-then-capped (the
    * Ann.incrementalCosineDups house rule): broadcast back onto the
    * labeled scan under `maxBroadcastShortlist` rows, an AQE shuffle
    * join past it — identical rows either way (KnnLabelSpec pins the
    * equality and both plan shapes), so an oversized query set degrades
    * instead of OOMing the driver at the label-fetch join. */
  def knnLabel(emb: DataFrame, idCol: String, vecCol: String,
               labelCol: String, isQuery: Column, k: Int,
               maxBroadcastShortlist: Long = 4000000L): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(emb.schema(labelCol).dataType),
      s"knnLabel requires an integral label column (the vote tie-break " +
        s"negates it); got ${emb.schema(labelCol).dataType.simpleString} — " +
        "map string labels to ids first")
    val queries = emb.filter(isQuery)
    val labeled = emb.filter(!isQuery)
    val top = Ann.bruteForceTopK(labeled, queries, idCol, vecCol, k)
      .select("query_id", "cand_id")
      .localCheckpoint()
    // exact count, not the Guards.underCapShared probe: the shortlist is
    // already materialized above (it would otherwise re-run the top-k
    // scan for the vote join), so counting it is a cheap cache-backed job
    val topHinted =
      if (top.count() <= maxBroadcastShortlist) broadcast(top) else top
    val votes = labeled
      .select(col(idCol).as("cand_id"), col(labelCol).as("nbr_label"))
      .join(topHinted, "cand_id")
      .groupBy("query_id", "nbr_label")
      .agg(count(lit(1)).as("votes"))
    votes.groupBy("query_id")
      .agg(max(struct(col("votes").as("votes"),
        (-col("nbr_label").cast("long")).as("negl"))).as("w"))
      .select(col("query_id"),
        // cast back to the INPUT label type: a long label narrowed to int
        // here would be silently truncated
        (-col("w").getField("negl"))
          .cast(emb.schema(labelCol).dataType).as("pred_label"),
        col("w").getField("votes").as("votes"))
  }
}
