package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * shingles/buckets), so diameters stay in the single digits; graphs whose
  * diameter exhausts `maxIters` automatically fall back to the
  * O(log n)-round large-star/small-star formulation
  * ([[connectedComponentsStar]]) instead of failing. For dedup-shaped
  * (dense, low-diameter) graphs label propagation stays the default — one
  * shuffle fewer per round and a cheaper per-round plan.
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
      // candidate label per node: min over its own and its neighbors' labels.
      // localCheckpoint (not bare persist): labels feeds itself next round,
      // so the logical plan doubles per round — 20 rounds of a
      // non-converging graph would mean a 2^20-node plan tree before the
      // star fallback even starts. Checkpointing materializes the same
      // cache AND truncates lineage to it.
      val next = edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("comp"))
        .union(labels)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    edges.unpersist()
    if (!converged) {
      // diameter > maxIters: not a near-dup cluster shape. Don't strand the
      // cached label frame, and don't fail — re-solve with the
      // round-logarithmic star algorithm, which a long chain can't starve.
      labels.unpersist()
      return connectedComponentsStar(pairs, aCol, bCol)
    }
    labels
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * fallback for pair graphs whose diameter exceeds what per-round label
    * propagation can cover. Rounds are O(log n) in the component size
    * (each pair of phases at least halves every non-star structure), where
    * plain propagation needs diameter-many rounds.
    *
    * Per round, on the edge set itself (no separate label frame):
    *  - large-star: every node u links each LARGER neighbor v > u to
    *    m(u) = min(Γ(u) ∪ u) — one groupBy + one join, both keyed on u;
    *  - small-star: orient edges toward the smaller endpoint; every node u
    *    links itself and each smaller neighbor to the smallest.
    * Both phases move edge endpoints monotonically toward component minima;
    * the fixpoint is a star per component centered at its minimum id, read
    * out directly as (id, comp). Shuffles carry (long, long) edges only.
    *
    * Convergence check: (count, Σ xxhash64(lo, hi)) over the canonical
    * edge set — equal across a round ⇒ the set is unchanged (a sum
    * collision while the set differs needs ≥2^64-odds cancellation; the
    * count guard removes the trivial collisions). One aggregate per round
    * over the already-persisted frame, same trick as the label-sum
    * watermark above. */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
                              maxIters: Int = 50): DataFrame = {
    // canonical undirected edges (lo < hi); self-pairs carry no information
    var edges = pairs
      .select(least(col(aCol), col(bCol)).as("lo"),
        greatest(col(aCol), col(bCol)).as("hi"))
      .filter(col("lo") =!= col("hi"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    def watermark(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)).as("n"),
        coalesce(sum(xxhash64(col("lo"), col("hi")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)")).as("h")).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = watermark(edges) // also materializes the persist
    var converged = prev._1 == 0L // empty graph: already done
    var iter = 0
    while (!converged && iter < maxIters) {
      // ---- large-star: (v, m(u)) for every neighbor v > u --------------
      val nbrs = edges.select(col("lo").as("u"), col("hi").as("v"))
        .union(edges.select(col("hi").as("u"), col("lo").as("v")))
      val mins = nbrs.groupBy("u")
        .agg(least(col("u"), min("v")).as("m"))
      val large = nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("m").as("lo"), col("v").as("hi")) // m ≤ u < v
        .distinct()
        .localCheckpoint() // eager: materialized before the input unpersists
      edges.unpersist()
      // ---- small-star: u and every smaller neighbor link to the min ----
      val next = {
        val d = large.select(col("hi").as("u"), col("lo").as("v")) // v < u
        val m2 = d.groupBy("u").agg(min("v").as("m")) // m < u by construction
        d.join(m2, "u")
          .select(col("m").as("lo"), col("v").as("hi"))
          .filter(col("lo") =!= col("hi")) // (m, m) self-link
          .union(m2.select(col("m").as("lo"), col("u").as("hi")))
          .distinct()
          // lineage cut per round: edges appears 4× in a round's plan, so
          // an uncut tree grows 4^rounds and the plan/codegen machinery —
          // not the data — becomes the bottleneck
          .localCheckpoint()
      }
      val cur = watermark(next)
      large.unpersist()
      edges = next
      // compareTo, not equals: BigDecimal.equals is scale-sensitive
      converged = cur._1 == prev._1 && cur._2.compareTo(prev._2) == 0
      prev = cur
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIters rounds")
    // fixpoint edges are (component-min, member); centers and singletons
    // label themselves
    val labels = edges.select(col("hi").as("id"), col("lo").as("comp"))
      .union(edges.select(col("lo").as("id"), col("lo").as("comp")))
      .union(pairs.select(col(aCol).as("id"), col(aCol).as("comp"))
        .filter(col(aCol) === col(bCol))) // degenerate self-pairs
      .groupBy("id").agg(min("comp").as("comp"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    edges.unpersist()
    labels
  }

  /** Keep one canonical row per near-dup group: the minimum-id member of
    * each component survives; rows not in any pair are their own group and
    * always survive. Left-anti join on the non-canonical id set — the only
    * thing shuffled is (id, component). */
  def canonicalize(df: DataFrame, pairs: DataFrame, idCol: String,
                   aCol: String, bCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val graphDt = cc.schema("id").dataType
    // localCheckpoint materializes the (small) non-canonical id set and
    // cuts its lineage, so the loop's persisted label frame can be released
    // here instead of leaking one cache entry per canonicalize call; the
    // drop set keeps the GRAPH's id type, and [[idEq]] bridges the
    // caller's id type at the anti-join below
    val dropIds = cc.filter(col("id") =!= col("comp"))
      .select(col("id").as("__drop_id"))
      .localCheckpoint()
    cc.unpersist()
    df.join(dropIds,
      idEq(col(idCol), df.schema(idCol).dataType, col("__drop_id"), graphDt),
      "left_anti")
  }

  /** Join-key equality between the caller's id column and a pair-graph id.
    * Same type → native equality (the common path, zero overhead).
    * Differing types → BOTH sides cast to decimal(38,0): exact for any
    * integral id (no PromoteStrings DOUBLE widening, which corrupts
    * equality above 2^53) AND representation-normalizing for formatted
    * numeric strings — a cast of the graph's bigint to the caller's
    * string type would compare "7" != "007" and silently keep both
    * members of a dup group (zero-padded exports are common); decimal
    * compares their VALUES. try_cast, not cast: under the session's ANSI
    * mode a plain cast THROWS on the first non-numeric caller id, but a
    * junk id is a legitimate corpus row that can never appear in a
    * numeric pair graph — try_cast sends it to NULL, it matches nothing,
    * and it survives as its own singleton group (the documented
    * contract; pinned in DedupGroupsSpec). FRACTIONAL values get the
    * same singleton treatment: try_cast to decimal(38,0) ROUNDS
    * (7.5 → 8), so a non-integral caller id could otherwise falsely
    * equal a neighboring graph id and be silently dropped — [[exactDec]]
    * nulls any value that fails an integrality check instead. Ids are
    * integral by contract; this makes a contract violation inert rather
    * than corrupting. */
  private def idEq(callerId: Column,
                   callerDt: org.apache.spark.sql.types.DataType,
                   graphId: Column,
                   graphDt: org.apache.spark.sql.types.DataType): Column =
    if (callerDt == graphDt) callerId === graphId
    else exactDec(callerId, callerDt) === exactDec(graphId, graphDt)

  /** The cross-type id join key: the value as decimal(38,0) — exact for
    * any integral id up to 38 digits (no DOUBLE widening above 2^53) —
    * but NULL for fractional values, which decimal(38,0) would round
    * into a neighboring id. The integrality check dispatches on the
    * SOURCE type: integral columns carry no fraction by construction
    * (straight to the key, zero probe cost); DecimalType columns compare
    * natively against their own floor — exact at ANY precision, so a
    * wide decimal(38,s) fractional id ≥ 10²⁰ (which would overflow a
    * fixed-scale probe to NULL and slip through to the rounding cast)
    * is still caught; string/double inputs use a decimal(38,18) probe.
    * Residual, stated: a STRING id with > 20 integer digits AND a
    * fractional part overflows that probe and falls through to the
    * rounding (38,0) cast — no 64-bit-sourced or decimal-sourced id can
    * produce one, and a string that wide is outside the integral-id
    * contract entirely. */
  private def exactDec(c: Column,
                       dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    val key = c.try_cast(DecimalType(38, 0))
    dt match {
      case ByteType | ShortType | IntegerType | LongType => key
      case d: DecimalType if d.scale <= 0 => key // integral by type
      case _: DecimalType =>
        when(c =!= floor(c), lit(null).cast(DecimalType(38, 0)))
          .otherwise(key)
      case _ =>
        val d18 = c.try_cast(DecimalType(38, 18))
        when(d18.isNotNull && d18 =!= floor(d18),
          lit(null).cast(DecimalType(38, 0)))
          .otherwise(key)
    }
  }

  /** [[canonicalize]] with the survivor chosen by QUALITY, not id: per
    * near-dup group, the member maximizing `score` survives (id ascending
    * tie-break — a total order, so oracle-replayable). This is what
    * production dedup actually wants: an exact re-upload should lose to
    * the earlier copy, but a truncated or boilerplate-wrapped near-dup
    * should lose to the cleanest member regardless of arrival order.
    *
    * Scale shape: only GROUP MEMBERS (ids appearing in a pair) enter the
    * score join and the per-component window — partition size is one
    * dup group, never the corpus — and the final left-anti join ships
    * just the loser id set; rows in no pair never shuffle at all. */
  def canonicalizeBest(df: DataFrame, pairs: DataFrame, idCol: String,
                       aCol: String, bCol: String,
                       score: Column): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val callerDt = df.schema(idCol).dataType
    val graphDt = cc.schema("id").dataType
    // join BEFORE projecting the score: the quality expression is the
    // dominant per-row cost and must run over group members only, not
    // the corpus (a select-then-join would push the Project below the
    // join and score every row). [[idEq]] bridges the caller/graph id
    // types exactly (decimal(38,0), never DOUBLE widening — see there).
    // The GRAPH's own id is the tie-break column: ordering by a
    // caller-typed cast would flip score ties to lexicographic order for
    // string idCols ("10" < "9"), silently changing survivors — the
    // contract is the pair graph's own (numeric) id order, same as
    // [[canonicalize]]'s min-id rule
    val ccT = cc.select(cc("id").as("__cc_id"), cc("comp"))
    // collapse to ONE member row per graph id before ranking: a corpus
    // holding two value-equal representations of the same id ("7" and
    // "007" under a string idCol) would otherwise contribute two rows
    // sharing one __cc_id — the rank-2 row puts that __cc_id in the drop
    // set and the anti-join then removes BOTH representations, losing
    // the group's survivor entirely. The graph id's score is the MAX
    // over its representations (deterministic; comp is functionally
    // determined by __cc_id, so it rides the groupBy key). Documented
    // consequence: value-duplicate representations share one fate —
    // both kept when their id wins, both dropped when it loses.
    val members = df.join(ccT, idEq(col(idCol), callerDt, ccT("__cc_id"), graphDt))
      .select(ccT("__cc_id"), ccT("comp"), score.as("__score"))
      .groupBy("__cc_id", "comp").agg(max("__score").as("__score"))
    val w = Window.partitionBy("comp")
      .orderBy(desc("__score"), asc("__cc_id"))
    val dropIds = members
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") > 1)
      .select(col("__cc_id").as("__drop_id"))
      .localCheckpoint()
    cc.unpersist()
    df.join(dropIds,
      idEq(col(idCol), callerDt, col("__drop_id"), graphDt), "left_anti")
  }

  /** Cross-source duplication matrix: how many near-dup pairs straddle
    * each (source, source) combination — the analysis behind dataset
    * mixing decisions (a web slice that heavily duplicates the books
    * slice should not get independent mixture weight) and crawl-overlap
    * audits. Sources are canonically ordered (least first) so each
    * unordered pair counts once. Scale shape: the pair graph is the
    * already-bounded candidate set; two id-keyed joins attach sources
    * (the doc side prunable to (id, source)), then a vocabulary-bounded
    * groupBy — nothing corpus-sized shuffles beyond the (id, source)
    * projection. */
  def crossSourceMatrix(pairs: DataFrame, docs: DataFrame, idCol: String,
                        srcCol: String, aCol: String = "id_a",
                        bCol: String = "id_b"): DataFrame = {
    val src = docs.select(col(idCol).cast("long").as("__id"),
      col(srcCol).as("__src"))
    pairs
      .join(src, col(aCol).cast("long") === col("__id"))
      .withColumnRenamed("__src", "src_a").drop("__id")
      .join(src, col(bCol).cast("long") === col("__id"))
      .withColumnRenamed("__src", "src_b").drop("__id")
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Triangle census of the pair graph: (n_edges, n_wedges, n_triangles,
    * clustering_bp) in one row — the global clustering coefficient
    * 3·triangles/wedges in basis points. The diagnosis this buys for
    * dedup: TRUE duplicate clusters are near-cliques (clustering → 10⁴),
    * while threshold-artifact clusters are stars/chains (clustering → 0),
    * so a collapsing coefficient flags that [[connectedComponents]] is
    * about to glue unrelated documents through hub false-positives.
    *
    * Scale shape (the standard degree-oriented wedge join): each
    * undirected edge is oriented from its (degree, id)-smaller endpoint,
    * bounding out-degree at O(√m), so the wedge self-join is
    * Σ outdeg² = O(m^1.5) — the best known bound — instead of Σ deg²,
    * which a hub vertex would blow up. Wedge COUNT (for the coefficient)
    * is the orientation-free Σ d(d−1)/2, computed on the degree frame.
    * Everything shuffled is ids and degrees; one persisted edge frame
    * feeds degrees, wedges, and the closing semi-join. */
  def triangleCensus(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    // identical field names on both keys: CASE branches must agree on the
    // struct TYPE, not just its shape
    val uKey = struct(col("du").as("d"), col("u").as("x"))
    val vKey = struct(col("dv").as("d"), col("v").as("x"))
    val oriented = withDeg.select(
      when(uKey < vKey, col("u")).otherwise(col("v")).as("src"),
      when(uKey < vKey, col("v")).otherwise(col("u")).as("dst"),
      when(uKey < vKey, vKey).otherwise(uKey).as("dk"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wedges = oriented.select(col("src"), col("dst").as("b"), col("dk").as("bk"))
      .join(oriented.select(col("src"), col("dst").as("c"), col("dk").as("ck")),
        Seq("src"))
      .filter(col("bk") < col("ck"))
    // bk < ck means the closing edge {b, c}, if present, is oriented b→c
    val tris = wedges
      .join(oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"), "left_semi")
    val out = e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(
        coalesce(sum(expr("d * (d - 1) div 2")), lit(0L)).as("n_wedges")))
      .crossJoin(tris.agg(count(lit(1)).as("n_triangles")))
      .withColumn("clustering_bp",
        expr("CASE WHEN n_wedges = 0 THEN 0L " +
          "ELSE n_triangles * 3 * 10000 div n_wedges END"))
      // one-row result: materialize it (lineage cut) so both persisted
      // frames release HERE — the caller gets no handle to them, and a
      // long-lived session auditing many graphs would otherwise pin two
      // cache entries per call (the canonicalize localCheckpoint pattern)
      .localCheckpoint()
    e.unpersist()
    oriented.unpersist()
    out
  }

  /** Leakage-safe train/val/test split: the split is a pure function of
    * the DEDUP GROUP label, not the document id, so near-duplicates can
    * never straddle splits — the standard guard against eval contamination
    * through paraphrases/mirror copies that survive exact dedup. Documents
    * in no pair are their own singleton group (split by their own id).
    *
    * `bp` maps the group label to deterministic basis points (use
    * [[graft.operators.Sampling.lcgBp]] for the portable LCG); slots
    * [0, testBp) → "test", [testBp, testBp+valBp) → "val", rest "train".
    * Scale shape: the label frame from [[connectedComponents]] carries only
    * (id, comp) and joins `docs` on the id — ids and labels shuffle, text
    * never does; the label frame is localCheckpoint'd so the CC loop's
    * persisted lineage is released, as in [[canonicalize]]. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       aCol: String, bCol: String, testBp: Int, valBp: Int,
                       bp: Column => Column): DataFrame = {
    require(testBp >= 0 && valBp >= 0 && testBp + valBp <= 10000,
      s"basis points out of range: test=$testBp val=$valBp")
    val cc = connectedComponents(pairs, aCol, bCol)
    val labels = cc.withColumnRenamed("id", idCol).localCheckpoint()
    cc.unpersist()
    val g = coalesce(col("comp"), col(idCol))
    val slot = bp(g)
    docs.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol), g.as("group_id"),
        when(slot < testBp, lit("test"))
          .when(slot < testBp + valBp, lit("val"))
          .otherwise(lit("train")).as("split"))
  }

  /** Per-group shrinkage audit of [[canonicalize]]: how much of each
    * `groupCol` slice (source, language, ...) would near-dup dedup remove
    * — the number every mixture-weight decision needs NEXT TO the
    * cross-source overlap matrix (a slice that is 40% internal
    * duplicates does not deserve its raw row count's weight), and the
    * regression canary for the dedup config itself (a threshold change
    * that doubles removal in one source shows up here first).
    *
    * Same component resolution as [[canonicalize]]; the loser id set
    * (pair-graph members only — bounded by duplicates, not corpus)
    * broadcasts onto a LEFT join marking removed rows, and one
    * map-side-combined aggregate yields kept/removed counts with
    * integer-div basis points. The corpus is scanned once and never
    * shuffled on content. */
  def dedupImpact(df: DataFrame, pairs: DataFrame, idCol: String,
                  aCol: String, bCol: String, groupCol: String): DataFrame = {
    val cc = connectedComponents(pairs, aCol, bCol)
    val dropIds = cc.filter(col("id") =!= col("comp"))
      .select(col("id").as("__drop_id"))
      .localCheckpoint()
    cc.unpersist()
    df.join(broadcast(dropIds), col(idCol) === col("__drop_id"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        count(col("__drop_id")).as("n_removed"))
      .withColumn("n_kept", col("n_docs") - col("n_removed"))
      .withColumn("removed_bp", expr(
        "CASE WHEN n_docs = 0 THEN NULL ELSE (n_removed * 10000) div n_docs END"))
  }
}
