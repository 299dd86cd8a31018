package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dedup-group resolution: collapse a near-duplicate PAIR graph (the output
  * of MinHashDedup / SimHash / NGramJaccard / Ann.nearDupByCosine*) into
  * connected components, so each cluster of mutual near-dups keeps exactly
  * one canonical document — the step between "pairs found" and "corpus
  * deduplicated" in every large-scale training-data pipeline.
  *
  * Algorithm: hash-min label propagation (the join-based formulation of
  * connected components): every node starts labeled with its own id; each
  * round, a node's label becomes min(label, neighbors' labels); stop when a
  * round changes nothing. Each round is ONE shuffle (edge⋈label join +
  * min-aggregate), both with map-side partial aggregation; labels — never
  * payloads — ride the exchanges. Rounds needed = graph diameter, and
  * near-dup clusters are dense by construction (pairs share
  * shingles/buckets), so diameters stay in the single digits; `maxIters`
  * fails fast instead of looping silently if fed an adversarial
  * million-node chain. (The O(log n)-round large-star/small-star variant
  * exists for such graphs; for dedup clusters the simpler per-round plan —
  * and one shuffle fewer per round — wins.)
  *
  * Determinism: min() over distinct ids has a unique fixpoint, so the
  * component labeling is exactly reproducible — and oracle-checkable (the
  * DuckDB oracle replays it as a recursive CTE).
  */
object DedupGroups {

  /** (id, component) for every id appearing in `pairs`; component = the
    * minimum id reachable through the undirected pair graph.
    *
    * The returned frame is persisted (MEMORY_AND_DISK) — it is the loop's
    * final fixpoint and re-derives many jobs of lineage if recomputed.
    * Callers that keep the session running should `unpersist()` it when
    * done ([[canonicalize]] does; Verify/Bench clearCache per query). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIters: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    // undirected edge list, deduped; both orientations so one join pass
    // sees every neighbor
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // seed with round 1 fused into the init: comp₀ = min(id, neighbors) —
    // one groupBy instead of a distinct + a full propagate round (dense
    // dedup clusters — stars, cliques — converge at the seed already)
    var labels = edges.groupBy("src")
      .agg(least(col("src"), min("dst")).as("comp"))
      .withColumnRenamed("src", "id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // convergence watermark: labels only ever DECREASE (min fixpoint), so a
    // round changed something iff Σcomp shrank — one aggregate over the
    // already-persisted frame instead of a join against the previous
    // labels. Decimal(38,0) so the sum can't overflow at any id range.
    // coalesce: sum over an EMPTY labels frame (no pairs found) is null —
    // the empty graph must converge on round one, not NPE
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("s"))
        .head().getDecimal(0)
    var prevSum = labelSum(labels) // also materializes the persist
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // candidate label per node: min over its own and its neighbors' labels
      val next = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("comp"))
        .union(labels)
        .groupBy("id").agg(min("comp").as("comp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    edges.unpersist()
    // the failure path must not strand the cached label frame (callers are
    // told to retry with higher maxIters — each attempt would leak one)
    if (!converged) labels.unpersist()
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — the pair " +
        s"graph has diameter > $maxIters (not a near-dup cluster shape); " +
        s"raise maxIters or switch to a large-star/small-star formulation")
    labels
  }

  /** Keep one canonical row per near-dup group: the minimum-id member of
    * each component survives; rows not in any pair are their own group and
    * always survive. Left-anti join on the non-canonical id set — the only
    * thing shuffled is (id, component). */
  def canonicalize(df: DataFrame, pairs: DataFrame, idCol: String,
                   aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    // localCheckpoint materializes the (small) non-canonical id set and
    // cuts its lineage, so the loop's persisted label frame can be released
    // here instead of leaking one cache entry per canonicalize call
    val dropIds = cc.filter(col("id") =!= col("comp"))
      .select(col("id").as("__drop_id"))
      .localCheckpoint()
    cc.unpersist()
    df.join(dropIds, col(idCol) === col("__drop_id"), "left_anti")
  }
}
