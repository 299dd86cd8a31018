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

  /** True iff `df` has at most `cap` rows, established by counting a
    * limit(cap + 1) scan. The probe is LAZY — no materialization, and
    * output short-circuits at cap + 1 rows — so its cost is one pass of
    * the frame's own lineage (narrow maps stop early; an internal
    * shuffle, e.g. a distinct, still runs once over its input). Callers
    * holding an already-materialized frame should just compare
    * `df.count()` — the probe only pays off on lazy frames. */
  def underCap(df: DataFrame, cap: Long): Boolean = {
    require(cap >= 0, s"broadcast cap must be >= 0, got $cap")
    val lim = math.min(cap, Int.MaxValue - 2L).toInt
    df.limit(lim + 1).count() <= lim
  }
}
