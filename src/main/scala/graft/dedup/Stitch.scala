package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Fragment-stitch detection — the ORDERED near-dup relation dedup
  * misses: a long page fetched as paginated fragments (or a document
  * split by a chunking bug upstream) yields docs where the TAIL of one
  * overlaps the HEAD of the next. Whole-set Jaccard (q18) and
  * containment (q140) both score such pairs near zero — the shared
  * region is a sliver of each — yet the pair is exactly what a
  * reassembly pass needs. The signal: the last `h` token-n-grams of A
  * vs the first `h` of B, overlap ≥ minBp basis points of `h`.
  *
  * Direction matters and comes for free: candidates join TAIL postings
  * of one side against HEAD postings of the other, so (a, b) means
  * "a's end continues into b's start" — the edge list of the
  * reassembly chain, ready for row-66's connected components or a
  * simple follow-the-unique-successor walk.
  *
  * Scale shape is the q18 family's: only 2·h gram postings per doc
  * (CONSTANT per doc, not proportional to length — head/tail windows
  * are fixed), hot-gram DF cap as the outage guard, pair dedup, then
  * verification bounded by candidates with integer-bp scoring
  * ((10⁴·|∩|) div h — no floats). Docs with fewer than h grams carry
  * their whole sequence; the fixed-h denominator keeps tiny fragments
  * from reaching high scores on one shared gram. */
object Stitch {

  /** Ordered pairs (id_a, id_b, overlap_bp): a's tail-grams overlap b's
    * head-grams in ≥ minBp/10⁴ of `h`. Self pairs excluded. */
  def stitchPairs(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3, h: Int = 8, minBp: Int = 5000,
                  maxDf: Int = 1000): DataFrame = {
    require(h >= 1 && minBp >= 1 && minBp <= 10000,
      s"bad h=$h minBp=$minBp")
    val spark = docs.sparkSession
    val seqs = docs.select(col(idCol).as("id"),
      graft.functions.ShingleHashes(spark,
        TextFunctions.tokens(col(textCol)), n).as("sh"))
    // head/tail windows sliced BEFORE distinct (a repeated gram inside
    // the window collapses, matching the oracle's order of operations).
    // Materialized once (eager — see Guards.materialize): heads, tails
    // and both verification joins consume it
    val hs = graft.Guards.materialize(seqs.select(col("id"),
      array_distinct(slice(col("sh"), 1, h)).as("head"),
      array_distinct(when(size(col("sh")) >= h,
        slice(col("sh"), -h, h)).otherwise(col("sh"))).as("tail")))
    val heads = hs.select(col("id").as("id_b"), explode(col("head")).as("g"))
    val tails = hs.select(col("id").as("id_a"), explode(col("tail")).as("g"))
    val hot = heads.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("g")
    val cand = tails.join(broadcast(hot), Seq("g"), "left_anti")
      .join(heads.join(broadcast(hot), Seq("g"), "left_anti"), Seq("g"))
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(hs.select(col("id").as("id_a"), col("tail")), "id_a")
      .join(hs.select(col("id").as("id_b"), col("head")), "id_b")
      .withColumn("overlap_bp",
        expr("(10000 * CAST(size(array_intersect(tail, head)) AS BIGINT))" +
          s" div $h"))
      .filter(col("overlap_bp") >= minBp)
      .select("id_a", "id_b", "overlap_bp")
  }

  /** Reassembly plan from [[stitchPairs]] output: (id, chain_id, pos).
    * An edge survives only when it is MUTUAL-BEST — a's strongest
    * successor AND b's strongest predecessor (max overlap_bp, smaller
    * partner id on ties) — which breaks fan-in/fan-out so every node has
    * ≤ 1 in- and ≤ 1 out-edge and the kept graph is a set of simple
    * chains. chain_id = the chain's minimum id (row 66's components over
    * the kept edges); pos counts from each chain head (no in-edge),
    * walked until the frontier drains — one bounded equi-join per step.
    * Termination is STRUCTURAL, not a tuned cap: the kept graph has
    * in-degree ≤ 1 and out-degree ≤ 1, so it is a disjoint union of
    * simple paths and simple cycles; cycles have no head, so a walk
    * started from heads can never enter one and drains after the longest
    * chain. Fragments in no kept edge are complete documents, not
    * fragments — they don't appear. */
  def assemblyPlan(pairsIn: DataFrame): DataFrame = {
    // the pair frame's lineage is the whole posting+verify pipeline and
    // feeds SIX consumers (succ, pred, two semi probes, CC's edges, the
    // walk) — materialize it once (Verify/Bench clear per query)
    val pairs = pairsIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val succ = pairs.groupBy("id_a")
      .agg(max_by(col("id_b"),
        struct(col("overlap_bp"), -col("id_b"))).as("id_b"))
    val pred = pairs.groupBy("id_b")
      .agg(max_by(col("id_a"),
        struct(col("overlap_bp"), -col("id_a"))).as("id_a"))
    val kept = pairs.select("id_a", "id_b")
      .join(succ, Seq("id_a", "id_b"), "left_semi")
      .join(pred, Seq("id_a", "id_b"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val comp = DedupGroups.connectedComponents(kept, "id_a", "id_b")
    val heads = kept.select(col("id_a").as("id")).distinct()
      .join(kept.select(col("id_b").as("id")).distinct(), Seq("id"),
        "left_anti")
    // each step localCheckpoints its (tiny) frontier: lineage is CUT per
    // step, so the next join's plan is one scan ⋈ kept whatever the
    // depth — without this the step-i frontier nests all i prior plans
    // and the walk pays O(steps²) in plan strings and re-executed join
    // chains. The union accumulator checkpoints every 16 steps for the
    // same reason (the row-154 lineage rule).
    var frontier = heads.select(col("id"), lit(0L).as("pos"))
      .localCheckpoint()
    var out = frontier
    var step = 0
    var drained = frontier.isEmpty
    while (!drained) {
      step += 1
      frontier = frontier.join(kept, frontier("id") === kept("id_a"))
        .select(col("id_b").as("id"), (col("pos") + 1L).as("pos"))
        .localCheckpoint()
      if (frontier.isEmpty) drained = true
      else {
        out = out.unionAll(frontier)
        if (step % 16 == 0) out = out.localCheckpoint()
      }
    }
    out.join(comp, Seq("id"))
      .select(col("id"), col("comp").as("chain_id"), col("pos"))
  }
}
