package graft

import org.apache.spark.sql.DataFrame

/** Count-then-cap plumbing shared by every operator that broadcasts a
  * "driver-small by contract" frame (the Ann.incrementalCosineDups house
  * rule): verify the contract cheaply, broadcast under the cap, and let
  * the caller degrade to a shuffle plan past it instead of hitting the
  * driver broadcast ceiling as an OOM. One definition so cap semantics
  * (clamping, probe shape, validation) cannot drift between call sites.
  */
object Guards {

  /** Probe AND share: materialize at most `cap + 1` rows of `df` once
    * (`limit(cap + 1).localCheckpoint()`) and count them. Under the cap
    * the bounded checkpoint holds the WHOLE frame — the returned frame IS
    * the materialization the probe already paid, so the caller's main
    * plan never re-runs the probed lineage (a lazy limit-count probe
    * re-ran it: one normalize/tokenize pass for the probe, a second for
    * the plan). Past the cap the ≤ cap+1-row checkpoint is discarded and
    * the ORIGINAL lazy frame returns with `false` — the guard never
    * materializes a corpus-sized frame (the limit short-circuits at
    * cap + 1 rows, though an internal shuffle, e.g. a distinct, still
    * runs once over its input), and the over-cap plan stays
    * byte-identical to the unguarded one. LAZY localCheckpoint + count,
    * not persist + count: the count still materializes the checkpoint,
    * so probe and materialization stay ONE scheduler job — but the
    * blocks live as RDD storage the ContextCleaner reclaims when the
    * frame is garbage-collected. A Dataset.persist entry is held
    * STRONGLY by the session's CacheManager until explicit
    * unpersist/clearCache, so the persist formulation leaked one
    * MEMORY_AND_DISK entry of up to cap+1 (vector-carrying) rows per
    * under-cap call for the app's lifetime — exactly the accumulation a
    * long-lived query service over Bm25.searchIndex cannot afford. The
    * over-cap branch's discarded ≤ cap+1-row checkpoint is reclaimed
    * the same way — per call the blocks are bounded, and ACROSS calls
    * reclamation runs at driver-GC cadence (checkpoint blocks are also
    * invisible to spark.catalog.clearCache, which only clears the
    * CacheManager): a tight loop of over-cap probes can hold a few
    * discarded block sets between GC cycles, spilled to disk by
    * MEMORY_AND_DISK rather than pressuring the heap. The trade,
    * stated (the sortedNeighborhood comment): checkpoint blocks are
    * executor-local, so on a real cluster an executor loss fails the
    * consuming stage where a persist's lineage would recompute —
    * acceptable for a ≤ cap-row probe frame that one retry of the
    * operator rebuilds. Callers holding an already-materialized frame
    * should just compare `df.count()` (the KnnLabel variant). */
  def underCapShared(df: DataFrame, cap: Long): (DataFrame, Boolean) = {
    require(cap >= 0, s"broadcast cap must be >= 0, got $cap")
    val lim = math.min(cap, Int.MaxValue - 2L).toInt
    val cp = df.limit(lim + 1).localCheckpoint(eager = false)
    if (cp.count() <= lim) (cp, true) else (df, false)
  }

  /** Materialize a diamond-shaped plan's shared frame ONCE — eager
    * localCheckpoint in place of a lazy `persist`. A lazy cache under a
    * multi-consumer plan is RACED by AQE's concurrent stage jobs: each
    * consumer that starts before the cache fills recomputes the whole
    * shared lineage (measured: the q150 shingle pass ran 3-4x per query
    * under persist), and a cached plan additionally freezes its
    * partitioning against AQE coalescing
    * (spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=false).
    * The eager checkpoint runs the shared subtree exactly once, cuts
    * lineage (bounded downstream plan depth — the LinkGraph rule), and
    * its MEMORY_AND_DISK blocks are reclaimed by the ContextCleaner on
    * GC rather than pinned in the CacheManager. The trade, stated (the
    * [[underCapShared]] doc): checkpoint blocks are executor-local, so
    * on a real cluster an executor loss fails the consuming stage where
    * a persist's lineage would recompute — acceptable for intra-query
    * intermediates one operator retry rebuilds. */
  def materialize(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Release every persistent RDD the last query left behind. The
    * localCheckpoint blocks [[materialize]]/[[underCapShared]] create are
    * INVISIBLE to `spark.catalog.clearCache()` (which clears only the
    * CacheManager's Dataset entries), so a harness that runs hundreds of
    * queries in one session — Bench, Verify, ProfOne — would otherwise
    * accumulate MEMORY_AND_DISK checkpoint blocks until driver GC happens
    * to collect the dead frames (the ContextCleaner cadence), paying
    * memory/disk pressure and timing noise for frames no live plan can
    * reference. Call it in per-query cleanup AFTER clearCache; blocking,
    * so the next timed run starts with the blocks actually gone. Safe by
    * construction between queries: every surviving entry in
    * `getPersistentRDDs` belongs to a finished query's plan (in-query
    * persists are either unpersisted by their operator or dead with the
    * query), and unpersisting a localCheckpointed RDD only deletes its
    * blocks — the RDD object itself is never reused across queries. */
  def releaseMaterialized(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.getPersistentRDDs.valuesIterator
      .foreach(_.unpersist(blocking = true))
}
