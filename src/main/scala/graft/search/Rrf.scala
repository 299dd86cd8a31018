package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of ranked retrieval lists — the standard way to
  * combine lexical ([[Bm25]]) and dense ([[graft.similarity.Ann]]) rankings
  * without score calibration (Cormack, Clarke & Buettcher, SIGIR 2009:
  * RRF(d) = Σ_lists 1/(k₀ + rank_list(d))). Hybrid retrieval is the shape
  * modern data pipelines use for decontamination sweeps and RAG indexes:
  * lexical catches exact phrasing, embeddings catch paraphrase, and RRF is
  * robust to either list being noisy.
  *
  * Carried in INTEGER micro-units — each list contributes
  * `10⁶ div (k₀ + rank)` — so the fused score is an order-independent
  * int64 sum and a SQL oracle replays it exactly (no float calibration
  * anywhere; this is why RRF beats weighted score fusion for an
  * exactness-first engine). Ties in the fused score break on doc_id
  * ascending: a total order, replayable row-for-row.
  *
  * Scale shape: the inputs are ALREADY top-k lists (≤ k·|queries| rows
  * each — the expensive corpus-sized work happened inside the retrievers),
  * so fusion is a union + one partial-agg groupBy on (query, doc) + a
  * per-query window bounded by lists·k rows. Nothing corpus-sized moves.
  */
object Rrf {

  /** Fuse ranked lists (each `(query_id, doc_id, rank)` with rank ≥ 1)
    * into (query_id, doc_id, rrf_u, n_lists, rank): top-`k` per query by
    * fused score desc, doc_id asc. `k0` is the RRF smoothing constant
    * (60 in the original paper). */
  def fuse(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "RRF needs at least one ranked list")
    require(k >= 1 && k0 >= 0, s"bad k=$k / k0=$k0")
    val normed = lists.map(_.select(
      col("query_id").cast("long").as("query_id"),
      col("doc_id").cast("long").as("doc_id"),
      col("rank").cast("long").as("rank")))
    val w = Window.partitionBy("query_id").orderBy(desc("rrf_u"), asc("doc_id"))
    normed.reduce(_.unionByName(_))
      .withColumn("contrib_u", expr(s"1000000 div ($k0 + rank)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib_u").as("rrf_u"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "rrf_u", "n_lists", "rank")
  }

  /** Ranked-list agreement at k — |top-k ∩ top-k| per query in exact
    * bp: the retrieval-evaluation read behind "do the lexical and dense
    * systems even see the same documents" (low overlap is WHY [[fuse]]
    * helps; overlap drifting over corpus versions is an index-staleness
    * symptom beside row 151's idf delta). Queries present in either
    * list appear — a query one system returns nothing for reads 0, not
    * absent. One equi-join on (query, doc) over rank-capped lists, one
    * count per query.
    *
    * Shape: tag-union-aggregate, NOT a join — each input is consumed
    * exactly ONCE, so the expensive retriever plans behind the lists (a
    * BM25 postings scan, a dense corpus scan) run once each, and the
    * single plan schedules both retriever stage-trees CONCURRENTLY (a
    * join + query-universe union consumed each list twice — re-running
    * both retrievers — and patching that with eager checkpoints
    * serialized them into back-to-back blocking jobs, measurably worse
    * than the tagged union). Each list holds one row per (query, doc)
    * by the rank-list contract, so per-pair min/max of the side tag
    * decides membership: min=1 ∧ max=2 ⇔ both sides saw the document.
    * Two map-side-combined aggregates over ≤ 2·k·|queries| tag rows —
    * nothing corpus-sized moves. */
  def overlapAtK(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val aa = a.filter(col("rank") <= k).select("query_id", "doc_id")
      .withColumn("__s", lit(1))
    val bb = b.filter(col("rank") <= k).select("query_id", "doc_id")
      .withColumn("__s", lit(2))
    aa.unionByName(bb)
      .groupBy("query_id", "doc_id")
      .agg(min("__s").as("__mn"), max("__s").as("__mx"))
      .groupBy("query_id")
      .agg(sum(when(col("__mn") === 1 && col("__mx") === 2, 1L)
        .otherwise(0L)).as("n_common"))
      .withColumn("overlap_bp", expr(s"(10000 * n_common) div $k"))
  }
}
