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
    * byte-identical to the unguarded one. persist + count, not an eager
    * localCheckpoint: the count materializes INTO the cache, so probe
    * and materialization are ONE scheduler job instead of two — on a
    * tiny probed frame the second job is the whole guard cost. The
    * over-cap branch unpersists immediately (nothing to leak); the
    * under-cap frame's cache entry is reclaimed by the ContextCleaner
    * when the frame is collected, same lifetime story as a
    * localCheckpoint's blocks. Callers holding an already-materialized
    * frame should just compare `df.count()` (the KnnLabel variant). */
  def underCapShared(df: DataFrame, cap: Long): (DataFrame, Boolean) = {
    require(cap >= 0, s"broadcast cap must be >= 0, got $cap")
    val lim = math.min(cap, Int.MaxValue - 2L).toInt
    val cp = df.limit(lim + 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (cp.count() <= lim) (cp, true)
    else { cp.unpersist(blocking = false); (df, false) }
  }
}
