package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage — the entity-resolution step a curation
  * pipeline runs when the SAME real-world record (a customer, a site, a
  * paper) arrives from two feeds with small textual corruptions: pairs are
  * enumerated only WITHIN a user-chosen blocking key and verified by exact
  * Levenshtein distance, never all-pairs.
  *
  * Blocking is the whole scale story (the same reason MinHash bands and
  * SimHash buckets exist for documents): a corpus-level fuzzy join is
  * quadratic, but records that don't share the block key can't match by
  * construction of the key, so the join is a plain hash equi-join whose
  * cost is Σ|block_l|·|block_r| — bounded by the caller's choice of key
  * cardinality. The classic trade is recall: an edit INSIDE the blocking
  * prefix moves the twin to another block and it is not found (callers
  * wanting full recall run a second pass under an independent key, e.g.
  * suffix or phonetic — same operator, different `blockCol`).
  *
  * Verification is `levenshtein(l, r, maxDist)` — Spark's thresholded
  * variant abandons a pair once the running distance exceeds `maxDist`
  * (banded O(maxDist·len) instead of O(len²)), returning -1 past the
  * band; a `|len_l − len_r| ≤ maxDist` guard skips the DP entirely for
  * pairs no edit budget can bridge. Both engines implement classic
  * unit-cost Levenshtein, so a DuckDB oracle replays the output exactly.
  *
  * Scale notes: one shuffle per side on the block key; strings cross the
  * wire once. Blocking keys should be chosen so blocks stay bounded as
  * the corpus grows — AQE's skew-join split re-balances a hot block's
  * TASKS but cannot reduce its pair VOLUME, so [[linkBlocked]] carries a
  * per-block pair-count fail-fast (`maxBlockPairs`) that kills a
  * saturated-block job loudly before the quadratic verification runs.
  * Zero UDFs; the distance is a codegen'd native expression.
  */
object RecordLinkage {

  /** Pairs (id_l, id_r, dist) of records from `left` × `right` sharing
    * `blockCol` with `levenshtein(strCol_l, strCol_r) ≤ maxDist`.
    * Pre-aliased inputs: callers pass frames already shaped as
    * (id, block, s) via [[shape]] so cross-table linkage (clean feed vs
    * dirty feed) and self-linkage share one join.
    *
    * Pair-volume fail-fast (`maxBlockPairs`, the q18 maxDf / rangeJoin
    * raise_error family): blocking bounds the join at Σ|block_l|·|block_r|,
    * but a SATURATED block — a low-entropy key whose population keeps
    * growing with the corpus — detonates that sum quadratically, and
    * AQE's skew-join split balances TASKS, not pair VOLUME: a split hot
    * block still verifies every one of its |l|·|r| pairs. Per-block
    * counts (ONE tagged-union key-only aggregate, column-pruned — the
    * record strings never enter it) flag any block whose pair count
    * exceeds the cap, and the error rides the plan lazily (an empty
    * bad-block set costs one empty-broadcast probe per row): the job
    * dies loudly naming the block and both counts, pointing at the fix
    * — widen the blocking key, pre-salt the hot block, or run
    * [[Tuning.skewReport]] on the block column as a pre-flight —
    * instead of burning a cluster on quadratic verification.
    * RecordLinkageSpec pins both the trip and the under-cap
    * result-invariance. STREAMING inputs skip the guard (aggregating a
    * stream to count its blocks is itself an unsupported extra stateful
    * stage, and a microbatch's pair volume is already bounded by the
    * trigger size times the static side's hottest block — the batch
    * pre-flight on the STATIC master index is where the check belongs). */
  def linkBlocked(left: DataFrame, right: DataFrame,
                  maxDist: Int,
                  maxBlockPairs: Long = 64000000L): DataFrame = {
    require(maxDist >= 0, s"maxDist must be ≥ 0, got $maxDist")
    require(maxBlockPairs >= 1,
      s"maxBlockPairs must be ≥ 1, got $maxBlockPairs")
    val l = left.select(col("id").as("id_l"), col("block"),
      col("s").as("s_l"))
    val r = right.select(col("id").as("id_r"), col("block"),
      col("s").as("s_r"))
    val lg =
      if (left.isStreaming || right.isStreaming) l.withColumn("__trap",
        lit(null).cast("long"))
      else {
        // ONE tagged-union aggregate, not two per-side aggregates joined:
        // the guard's cost is fixed overhead on every under-cap call (it
        // took q137 from 0.62 to 1.00 s at sf0.1 as two aggregates), and
        // a union with conditional sums computes both per-block counts in
        // a single shuffle over the key-only rows — map-side partials on
        // each input, no aggregate-aggregate join stage at all. Blocks
        // present on only one side generate no pairs and are filtered
        // before the division (which also keeps __nr ≥ 1, so the ANSI
        // `div` below cannot itself throw on zero). NULL blocks are
        // excluded explicitly: a null key never matches in the pair
        // equi-join (zero pairs by construction), but groupBy COUNTS
        // nulls as a group — without the filter a large null-key
        // population on both sides (records missing the blocking
        // attribute) would spuriously trip the guard. The old two-
        // aggregate shape excluded them implicitly via its inner join's
        // null-key semantics; the union shape must do it by hand.
        val counts = l.select(col("block"), lit(true).as("__isl"))
          .unionByName(r.select(col("block"), lit(false).as("__isl")))
          .filter(col("block").isNotNull)
          .groupBy("block")
          .agg(sum(when(col("__isl"), 1L).otherwise(0L)).as("__nl"),
            sum(when(!col("__isl"), 1L).otherwise(0L)).as("__nr"))
          .filter(col("__nl") >= 1L && col("__nr") >= 1L)
        // overflow-free product test: nl·nr > cap  ⇔  nl > cap div nr
        // (nr ≥ 1 by the filter above; a long·long product could overflow
        // and, under ANSI, turn the guard itself into the crash)
        val badTrap = counts
          .filter(expr(s"__nl > ${maxBlockPairs}L div __nr"))
          .select(col("block"),
            raise_error(concat(
              lit("linkBlocked: block '"), col("block"), lit("' yields "),
              col("__nl"), lit(" x "), col("__nr"),
              lit(s" verification pairs (> maxBlockPairs=$maxBlockPairs)" +
                " — widen the blocking key, pre-salt the hot block, or run" +
                " Tuning.skewReport on the block column first")))
              .cast("long").as("__trap"))
        // the trap projection sits BELOW the broadcast exchange, so a
        // saturated block kills the job while BUILDING the (normally
        // empty) broadcast — at the key-only aggregate stage, before a
        // single verification pair is generated; __trap rides into dist
        // so column pruning cannot delete the raise
        l.join(broadcast(badTrap), Seq("block"), "left")
      }
    lg.join(r, Seq("block"))
      // length guard first: |len diff| > maxDist can never verify, and
      // the comparison is O(1) vs the banded DP
      .filter(abs(length(col("s_l")) - length(col("s_r"))) <= maxDist)
      .withColumn("dist",
        levenshtein(col("s_l"), col("s_r"), maxDist).cast("long") +
          coalesce(col("__trap"), lit(0L)))
      .filter(col("dist") >= 0) // thresholded variant returns -1 past band
      .select("id_l", "id_r", "dist")
  }

  /** Shape a table for [[linkBlocked]]: (id, block, s). */
  def shape(df: DataFrame, idCol: String, blockCol: org.apache.spark.sql.Column,
            strCol: String): DataFrame =
    df.select(col(idCol).as("id"), blockCol.as("block"), col(strCol).as("s"))

  /** Self-linkage: near-duplicate records INSIDE one table. Same join,
    * plus `id_l < id_r` so each unordered pair appears once and self
    * pairs (dist 0 by definition) never do. */
  def selfLinkBlocked(df: DataFrame, maxDist: Int): DataFrame =
    linkBlocked(df, df, maxDist).filter(col("id_l") < col("id_r"))

  /** Incremental linkage — the rows-79/100/123/126 ingest shape for
    * RECORDS: today's shaped batch probed against a PERSISTED shaped
    * master index (read back from parquet; the master strings are never
    * re-derived), plus within-batch self-linkage so two corrupted
    * arrivals of the same entity link to each other even when the master
    * is absent. Returns (new_id, match_id, dist); for within-batch pairs
    * new_id is the larger id (arrival-order convention, deterministic).
    * At scale the index parquet is bucketed by block so the daily probe
    * join is exchange-free on the master side. */
  def incrementalLink(index: DataFrame, batch: DataFrame,
                      maxDist: Int): DataFrame =
    linkBlocked(batch, index, maxDist)
      .select(col("id_l").as("new_id"), col("id_r").as("match_id"),
        col("dist"))
      .unionByName(selfLinkBlocked(batch, maxDist)
        .select(col("id_r").as("new_id"), col("id_l").as("match_id"),
          col("dist")))

  /** Sorted-neighborhood candidate generation (Hernández–Stolfo 1995) —
    * the blocking alternative to [[linkBlocked]]'s prefix blocks: records
    * sort on the key and every pair within `w` positions becomes a
    * candidate, so near-duplicates whose PREFIX diverges (the q137
    * documented recall trade) still pair as long as they sort nearby.
    * Exact SNM semantics — the candidate set is every rank pair with
    * 0 < gap ≤ w under the (key, id) total order.
    *
    * The global rank never runs a corpus sort task: 2-char-prefix
    * buckets roll per-bucket counts into a ≤ |prefixes| offsets frame
    * (the Curriculum rank rule over a lexicographic bucket order),
    * bucket-local row_numbers attach the offsets back. Pair generation
    * replicates each row to its rank block and the NEXT block (w <
    * blockSize by contract, so any within-w partner lives in one of the
    * two) — one equi-join on the block id, never a rank theta-join;
    * output is ≤ n·w pairs by construction. Known skew mode, documented:
    * a hot 2-char prefix concentrates its bucket's row_number on one
    * partition — widen the prefix (or pre-salt the hot bucket) when the
    * key distribution is pathological. */
  def sortedNeighborhood(df: DataFrame, idCol: String, keyCol: String,
                         w: Int, blockSize: Int = 256): DataFrame = {
    require(w >= 1 && blockSize >= w,
      s"need 1 <= w <= blockSize, got w=$w blockSize=$blockSize")
    import org.apache.spark.sql.expressions.Window
    val base = df
      .filter(col(idCol).isNotNull && col(keyCol).isNotNull)
      .select(col(idCol).as("id"), col(keyCol).as("__k"))
      .withColumn("__b", expr("substring(__k, 1, 2)"))
    val offsets = base.groupBy("__b").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum("__cnt").over(
          Window.orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("__cnt"), lit(0L)))
      .select("__b", "__off")
    // ranked feeds BOTH sides of the block self-join below.
    // localCheckpoint, not persist: it materializes the diamond exactly
    // once (the offsets join + window never run twice), holds no
    // session-lifetime catalog entry — the RDD blocks are released when
    // the frame is garbage-collected, so repeated calls cannot
    // accumulate a cache leak — and keeps the (n·w pair) RESULT fully
    // lazy, so a caller consuming a reduction streams the pairs without
    // ever storing them. The trade, stated: checkpoint blocks live in
    // executor-LOCAL storage, so on a multi-executor cluster an executor
    // loss makes downstream stages fail where a persist's lineage would
    // recompute — acceptable here (the ranked frame is one window pass
    // to rebuild by re-running the operator; reliable checkpointing
    // would pay a distributed-FS write per call), and the eager
    // materialization is work the self-join needs immediately anyway
    val ranked = base.join(broadcast(offsets), Seq("__b"))
      .withColumn("__r", col("__off") +
        row_number().over(
          Window.partitionBy("__b").orderBy(col("__k"), col("id"))) - 1L)
      .withColumn("__blk", expr(s"__r div $blockSize"))
      .localCheckpoint()
    val probe = ranked.select(col("id").as("id_a"), col("__r").as("r_a"),
      explode(array(col("__blk"), col("__blk") + 1L)).as("__jblk"))
    probe.join(
        ranked.select(col("id").as("id_b"), col("__r").as("r_b"),
          col("__blk").as("__jblk")),
        Seq("__jblk"))
      .filter(col("r_b") > col("r_a") && col("r_b") - col("r_a") <= w)
      .select(col("id_a"), col("id_b"),
        (col("r_b") - col("r_a")).as("gap"))
  }
}
