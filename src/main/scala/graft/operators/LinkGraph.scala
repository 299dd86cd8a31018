package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-graph centrality for crawl prioritization — PageRank over an edge
  * list, the standard quality prior a web-corpus pipeline feeds into URL
  * frontier scheduling and per-host mixture weights (hosts that the link
  * graph endorses get crawled deeper and weighted higher than link-farm
  * islands).
  *
  * All arithmetic is INTEGER micro-units (1.0 ≡ 1,000,000), the repo's
  * rows-76/102 rule: per-node rank starts at 10⁶, each iteration computes
  *
  *   pr'(u) = 150000 + (85 · Σ_{v→u} (pr(v) div outdeg(v))) div 100
  *
  * with every division an integer floor — so the result is exactly
  * reproducible on any engine and any partitioning (float PageRank differs
  * run-to-run under reassociated sums; this one cannot). The damping
  * split (0.15 / 0.85) is the Brin–Page constant. Deliberate semantics,
  * all documented: ITERATIONS ARE FIXED (a convergence check is a second
  * per-iteration aggregate; fixed depth is deterministic cost and
  * deterministic output — callers wanting convergence compare successive
  * frames themselves); parallel edges collapse (an endorsement counts
  * once); DANGLING mass evaporates (the redistribution variant adds a
  * broadcast scalar per iteration but makes every rank depend on the
  * global dangling sum's own floor order — evaporation keeps the
  * per-node recurrence purely local and is the common simplification).
  *
  * Scale notes: the edge list with out-degrees is computed ONCE and
  * persisted across iterations; each iteration is one equi-join of the
  * (node, pr) frame onto edges (both shuffle-partitioned on the join key)
  * plus one map-side-combined sum per destination — per-iteration cost is
  * O(|E|/p) with no driver-side state and nothing quadratic. Ranks and
  * degrees are the only things that shuffle; at web scale the edge frame
  * would be bucketed by src so the per-iteration join is exchange-free.
  * LINEAGE IS CUT every 8 iterations (`localCheckpoint` on the rank
  * frame — two longs per node, cheap to materialize): without it the
  * plan nests one join per iteration and convergence-depth runs (20+)
  * pay quadratic plan-compilation/explain cost; with it plan depth is
  * bounded by the checkpoint cadence at any iteration count
  * (LinkGraphSpec pins this at iters=25).
  */
object LinkGraph {

  /** Materialize the per-node result (eager `localCheckpoint` — a few
    * longs per node, the cheapest durable form). The iteration frames are
    * eager checkpoints too (Guards.materialize): their blocks are
    * reclaimed by the ContextCleaner on GC or by
    * Guards.releaseMaterialized in the harnesses' per-query cleanup —
    * the lazy persists this replaces pinned CacheManager entries AND
    * froze the iteration frames at the raw shuffle-partition width
    * (cached plans are exempt from AQE coalescing), so every iteration
    * re-scanned machine-wide caches of tiny frames; the checkpoints are
    * AQE-coalesced to the data's width. */
  private def finish(result: DataFrame): DataFrame =
    result.localCheckpoint()

  /** (node, pr) after `iters` fixed integer-PageRank iterations over
    * `edges` (columns `src`, `dst`; parallel edges collapse; node set =
    * distinct src ∪ dst). pr is micro-units, initial 1,000,000 per node. */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be ≥ 0, got $iters")
    // the edge dedup shuffle feeds deg, withDeg AND nodes — materialize
    // it once (the lazy shape re-ran the distinct per consumer), then
    // the per-iteration frames once each
    val e = graft.Guards.materialize(
      edges.select(col("src"), col("dst")).distinct())
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = graft.Guards.materialize(e.join(deg, Seq("src")))
    val nodes = graft.Guards.materialize(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    var pr = nodes.withColumn("pr", lit(1000000L))
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(pr, withDeg("src") === pr("node"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(150000L) + expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100"))
            .as("pr"))
      // cut lineage on the cadence (class doc): plan depth stays bounded
      // at convergence-style iteration counts
      if (i % 8 == 0 && i < iters) pr = pr.localCheckpoint()
    }
    finish(pr)
  }

  /** HITS hubs & authorities (Kleinberg 1999) — the directory-vs-content
    * split PageRank can't see: a hub links to many good authorities, an
    * authority is linked by many good hubs; crawl pipelines read hubs as
    * seed-list candidates and authorities as content-quality priors.
    * This is the UNNORMALIZED fixed-iteration integer variant: h₀ = 1
    * everywhere, then iteration i computes a_i(u) = Σ_{v→u} h_{i−1}(v)
    * followed by h_i(u) = Σ_{u→v} a_i(v). Without the cosmetic norm step
    * the scores after k iterations are exact alternating-walk COUNTS —
    * integers, engine-reproducible, and RANK-equivalent to normalized
    * HITS (each norm is one positive scalar per iteration). `iters` is
    * capped at 3 by contract: counts grow like d^(2k) and the cap keeps
    * int64 headroom at web-scale degrees — beyond it, normalize, and
    * that's a different (float) operator. Shape matches [[pageRank]]:
    * the deduped edge frame persists once; each half-iteration is one
    * equi-join plus one map-side-combined sum; zero-score nodes stay
    * present via the left join onto the node frame. */
  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 3,
      s"iters must be in [1, 3] (int64 walk-count headroom), got $iters")
    val e = graft.Guards.materialize(
      edges.select(col("src"), col("dst")).distinct())
    val nodes = graft.Guards.materialize(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    var hub = nodes.withColumn("v", lit(1L))
    var auth: DataFrame = nodes.withColumn("v", lit(0L))
    for (_ <- 1 to iters) {
      auth = nodes.join(
          e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node")).agg(sum("v").as("__s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(0L)).as("v"))
      hub = nodes.join(
          e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
            .groupBy(col("src").as("node")).agg(sum("v").as("__s")),
          Seq("node"), "left")
        .select(col("node"), coalesce(col("__s"), lit(0L)).as("v"))
    }
    finish(auth.withColumnRenamed("v", "auth")
      .join(hub.withColumnRenamed("v", "hub"), Seq("node")))
  }

  /** TrustRank — personalized PageRank (Gyöngyi et al. 2004): the
    * restart mass is NOT uniform but a caller-supplied per-node teleport
    * table (here typically derived from content quality), so trust
    * propagates FROM vetted seeds through the link graph and spam hosts
    * — reachable mostly from other spam — starve. Same integer
    * micro-unit discipline as [[pageRank]]:
    *
    *   pr₀(u) = tele(u);  pr'(u) = tele(u) + (85 · Σ pr(v) div outdeg(v)) div 100
    *
    * Nodes absent from the teleport table restart with 0 (never seeded —
    * they only earn rank through inlinks from seeded regions); dangling
    * mass evaporates and parallel edges collapse exactly as in
    * [[pageRank]]. Same per-iteration cost shape: one equi-join + one
    * map-side-combined sum; the teleport table joins once and persists. */
  def trustRank(edges: DataFrame, teleport: DataFrame,
                iters: Int): DataFrame = {
    require(iters >= 0, s"iters must be ≥ 0, got $iters")
    val e = graft.Guards.materialize(
      edges.select(col("src"), col("dst")).distinct())
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = graft.Guards.materialize(e.join(deg, Seq("src")))
    // node set includes TELEPORT seeds, not just edge endpoints: a
    // vetted seed with no links yet must still appear with its restart
    // mass — deriving nodes from edges alone would silently drop exactly
    // the hand-vetted hosts the operator exists to protect
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .union(teleport.select(col("node")))
      .distinct()
    val tele = graft.Guards.materialize(
      nodes.join(teleport, Seq("node"), "left")
        .select(col("node"), coalesce(col("tele"), lit(0L)).as("tele")))
    var pr = tele.select(col("node"), col("tele").as("pr"))
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(pr, withDeg("src") === pr("node"))
        .select(col("dst").as("node"), expr("pr div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("m"))
      pr = tele.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("tele") + expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100"))
            .as("pr"))
      // the pageRank lineage rule: bounded plan depth at any iters
      if (i % 8 == 0 && i < iters) pr = pr.localCheckpoint()
    }
    finish(pr)
  }

  /** Link-exchange (reciprocal-link) profile — the classic link-farm
    * signal PageRank alone misses: two hosts endorsing each other inflate
    * both ranks, so per host we report what share of its outlinks are
    * reciprocated. (host, outdeg, recip, recip_bp) with recip_bp =
    * 10⁴·recip div outdeg; organic sites sit low, exchange rings near
    * 10⁴ — the q142 reputation table's natural next column.
    *
    * Self-loops are excluded (a page linking itself is not an exchange),
    * and hosts with no non-self outlinks don't appear (no behavior to
    * measure). One distinct + one self equi-join on the (src, dst) pair —
    * an edge is reciprocated iff its reverse exists — plus two map-side
    * combined counts; everything keys on host strings, nothing quadratic. */
  def reciprocalProfile(edges: DataFrame): DataFrame = {
    val e = graft.Guards.materialize(
      edges.select(col("src"), col("dst")).distinct()
        .filter(col("src") =!= col("dst")))
    val rev = e.select(col("dst").as("src"), col("src").as("dst"))
    val recip = e.join(rev, Seq("src", "dst"), "left_semi")
      .groupBy("src").agg(count(lit(1)).as("recip"))
    finish(e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .join(recip, Seq("src"), "left")
      .na.fill(0L, Seq("recip"))
      .select(col("src").as("host"), col("outdeg"), col("recip"),
        expr("(10000 * recip) div outdeg").as("recip_bp")))
  }
}
