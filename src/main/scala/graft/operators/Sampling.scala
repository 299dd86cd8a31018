package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset mixing for training-data pipelines.
  *
  * `df.sample()` is the wrong tool at 100 TB: its Bernoulli draw depends on
  * partition layout and task retries, so two runs (or a retried stage) keep
  * different rows. Here the keep/drop decision is a pure function of the ROW
  * (hash of a stable key vs a threshold), which makes samples reproducible
  * across runs, clusters, and engines, stable under repartitioning, and —
  * because the filter is a per-row codegen'd expression evaluated at the
  * scan — executed with zero shuffles and full predicate parallelism.
  *
  * Two hash variants:
  *   - [[hashBp]] — xxhash64 of (salt, key): the production path; avalanche
  *     over arbitrary/composite keys.
  *   - [[lcgBp]] — a linear-congruential mix of an integral key, expressible
  *     verbatim in any SQL dialect (`((k % 1000003)·1103515249 + 12345) %
  *     10000`): the cross-engine-oracle path, and a documented escape hatch
  *     for engines without xxhash64. The multiplier is COPRIME to the 10⁴
  *     modulus (1103515249 ≡ 5249; gcd(5249, 10000) = 1), so every basis
  *     point in [0, 10000) is reachable — the classic LCG constant
  *     1103515245 ≡ 5245 shares a factor 5 with 10⁴ and would quantize all
  *     rates to multiples of 5 bp. All arithmetic stays within int64
  *     (max intermediate ≈ 1.1e15), so ANSI overflow checking never fires.
  */
object Sampling {

  /** Deterministic basis points in [0, 10000) from xxhash64(salt, key);
    * NULL for a null key. pmod, not %: xxhash64 is signed and % keeps the
    * sign. The null guard matters: xxhash64 SKIPS null inputs rather than
    * returning null, so without it every null-key row would share the one
    * hash of the bare salt — an all-kept-or-all-dropped cliff per rate.
    * A null bp fails every `bp < rate` filter, so null-key rows are
    * deterministically EXCLUDED from samples (they have no stable
    * identity to sample on). */
  def hashBp(key: Column, salt: Long = 42L): Column =
    when(key.isNull, lit(null).cast("long"))
      .otherwise(pmod(xxhash64(lit(salt), key), lit(10000L)))

  /** Portable LCG basis points in [0, 10000); `key` must be a non-negative
    * integral column (ids). Mirrored literally by the DuckDB oracle. */
  def lcgBp(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(1000003L)) * lit(1103515249L) + lit(12345L),
      lit(10000L))

  /** Per-stratum threshold column from a rate table (basis points kept). */
  private def thresholdFor(strataCol: String, ratesBp: Map[String, Int],
                           defaultBp: Int): Column =
    ratesBp.foldLeft(lit(defaultBp)) { case (acc, (stratum, bp)) =>
      when(col(strataCol) === stratum, lit(bp)).otherwise(acc)
    }

  /** Keep each row iff bp(row) < rate(stratum): an exact-rate, deterministic
    * stratified sample. Rates are basis points (2500 ⇒ keep 25% of that
    * stratum in expectation); strata absent from the map use `defaultBp`. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       ratesBp: Map[String, Int], defaultBp: Int,
                       bp: Column): DataFrame =
    df.filter(bp < thresholdFor(strataCol, ratesBp, defaultBp))

  /** Exact top-⌈frac·N⌉ rows per group by (score DESC, tie ASC) — the
    * "keep the best p% of documents per language" curation gate, selected
    * WITHOUT ranking the corpus.
    *
    * The naive formulation (`ntile`/`row_number` over
    * `partitionBy(group)`) is a scale-killer: with a handful of groups
    * (languages), the window shuffle lands the entire corpus on a handful
    * of reducers. Instead, selection runs on a score HISTOGRAM:
    *
    *  1. `groupBy(group, score).count()` — partial agg; the shuffle carries
    *     only distinct (group, score) pairs, not rows.
    *  2. A window over that tiny histogram finds each group's threshold
    *     score and how many boundary ties to admit (k = ⌈N·frac⌉ in exact
    *     integer arithmetic).
    *  3. Thresholds broadcast back; `score > thr` rows pass with a per-row
    *     filter at the scan. Only rows EXACTLY AT the threshold get a
    *     `row_number` — partitioned by (group, score), so the one skewed
    *     partition is bounded by the tie multiplicity at the boundary, not
    *     by the group size.
    *
    * Output set is identical to `ntile(den/num) = 1` over
    * `(score DESC, tie ASC)` when that order is total — which is why the
    * driver can oracle it exactly. Contract: `score` should be a
    * bounded-cardinality column (integer quality scores, bucketed floats);
    * a continuous double degrades step 1's histogram to ~N rows (still
    * correct, no longer cheap). */
  def topFracByScore(df: DataFrame, groupCol: String, scoreCol: String,
                     tieCol: String, fracNum: Int, fracDen: Int): DataFrame = {
    require(fracNum >= 1 && fracDen >= fracNum,
      s"need 0 < fracNum/fracDen <= 1, got $fracNum/$fracDen")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(groupCol, scoreCol).agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(groupCol).orderBy(desc(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy(groupCol)
    // k = ceil(N·num/den), all-integer (`div`, never Column./ which is
    // double division with a 2^53 exactness bound); N·num stays in int64
    // for any realistic corpus (num is a small ratio numerator)
    val thr = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__tot", sum(col("__c")).over(totW))
      .withColumn("__k",
        expr(s"(__tot * $fracNum + ${fracDen - 1}) div $fracDen"))
      // the threshold row: first (in score-desc order) where cum ≥ k
      .filter(col("__cum") >= col("__k") &&
        col("__cum") - col("__c") < col("__k"))
      .select(col(groupCol),
        col(scoreCol).as("__thr"),
        (col("__k") - (col("__cum") - col("__c"))).as("__need"))
    // null-SAFE threshold compare: NULL scores are a legitimate histogram
    // bucket that desc ordering puts LAST (the scoreNtile convention) — a
    // group whose k reaches into the NULL bucket has __thr = NULL, and a
    // plain `score >= NULL` filter would return ZERO rows for the whole
    // group instead of its top k. Non-null rows beat a NULL threshold
    // outright; threshold-bucket rows (null-safely) equal it and ration
    // by the tie window.
    val joined = df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) <=> col("__thr") ||
        col(scoreCol) > col("__thr") ||
        (col("__thr").isNull && col(scoreCol).isNotNull))
    val tieW = Window.partitionBy(groupCol, scoreCol).orderBy(asc(tieCol))
    joined
      .withColumn("__r",
        when(col(scoreCol) <=> col("__thr"), row_number().over(tieW))
          .otherwise(lit(0)))
      .filter(col("__r") <= col("__need"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Deterministic exact-k sample per group — "exactly 1000 docs from every
    * source, the same 1000 every run". Keeps the k rows with the SMALLEST
    * LCG priority `(id % 1000003)·1103515249 + 12345` per group (ties → min
    * id): the LCG scrambles ids, so the k-smallest-priority prefix is an
    * unbiased-by-construction deterministic sample, reproducible across
    * runs, partitionings and engines (the [[lcgBp]] contract, unreduced —
    * the full product stays < 2^53, so the Double-typed aggregator buffer
    * holds it exactly).
    *
    * Shape: the typed [[graft.functions.TopKAggregator]] — map-side partial
    * aggregation caps each partition's shuffle contribution at k rows per
    * group, where the row_number window formulation would shuffle EVERY row
    * to its group's reducer. Same reason it wins in
    * [[graft.similarity.Ann.bruteForceTopKAgg]].
    *
    * Returns (groupCol, idCol, rank) with rank 1..k in priority order;
    * groups smaller than k keep all their rows. NOTE the output groupCol is
    * STRING whatever the input type (the typed aggregator keys on a string):
    * a numeric group column comes back cast, and distinct values that
    * collide as strings would merge — join the original column back by
    * `idCol` if the input type must be preserved. */
  def sampleKPerGroup(df: DataFrame, groupCol: String, idCol: String,
                      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // negated priority: the aggregator keeps LARGEST scores, we want the
    // smallest priorities; its id-ascending tie-break matches the oracle's.
    // NULL ids are excluded up front (the hashBp convention: no stable
    // identity to sample on) — they would otherwise NPE the non-nullable
    // Long in the typed encoder below
    val rows = df.filter(col(idCol).isNotNull)
      .select(col(groupCol).cast("string").as("__g"),
        col(idCol).cast("long").as("__id"),
        -((col(idCol) % 1000003L) * 1103515249L + 12345L).cast("double"))
      .as[(String, Long, Double)]
    val topk = new graft.functions.TopKAggregator(k).toColumn
    rows.groupByKey(_._1)
      .mapValues { case (_, id, s) => (id, s) }
      .agg(topk.name("topk"))
      .toDF(groupCol, "topk")
      .select(col(groupCol), posexplode(col("topk")))
      .select(col(groupCol), col("col._1").as(idCol),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Deterministic token-budget sampling: admit documents in a reproducible
    * pseudo-random order until a global token budget fills — "give me
    * exactly ~1T tokens of this corpus, the same 1T every run".
    *
    * The admission order is (bp(key), id): the bp permutation shuffles
    * documents so the prefix is an unbiased sample, and the id tiebreak
    * makes the order total, hence the output exactly reproducible AND
    * exactly oracle-checkable. A document is kept iff the running token
    * total strictly before it is `< budgetTokens` — so the budget is
    * filled, the boundary document may overflow it (training pipelines
    * truncate the tail doc rather than undershoot), and at least one
    * document is kept for any positive budget.
    *
    * A global running sum in one window would serialize the corpus through
    * one reducer. Instead, the same histogram trick as [[topFracByScore]]:
    *
    *  1. per-bp-key token sums — partial agg; ≤ 10⁴ rows whatever the
    *     corpus size;
    *  2. one tiny window over that histogram finds which keys are fully
    *     admitted (cumulative ≤ budget) and the remaining budget entering
    *     each boundary key;
    *  3. fully-admitted keys pass with a broadcast semi-probe filter at the
    *     scan; only the one boundary key's documents (corpus/10⁴ of the
    *     data) run an id-ordered within-key running sum.
    */
  def tokenBudgetSample(df: DataFrame, idCol: String, tokenCol: String,
                        budgetTokens: Long, bp: Column): DataFrame = {
    require(budgetTokens >= 0, s"budget must be >= 0, got $budgetTokens")
    import org.apache.spark.sql.expressions.Window
    // rows whose bp key is NULL (e.g. hashBp of a null key) are excluded
    // up front: without this they would form a null histogram bucket that
    // consumes budget yet is dropped by the null-unequal equi-joins below,
    // silently undershooting the budget
    val keyed = df.withColumn("__k", bp).filter(col("__k").isNotNull)
    val hist = keyed.groupBy("__k")
      .agg(sum(col(tokenCol).cast("long")).as("__t"))
    // ≤ 10⁴ histogram rows: the single-task window is bounded by the bp
    // domain, not the corpus
    val wk = Window.orderBy("__k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val marked = hist
      .withColumn("__cumk", sum(col("__t")).over(wk))
      .withColumn("__beforek", col("__cumk") - col("__t"))
      .filter(col("__beforek") < budgetTokens)
    // a key is FULLY admitted only when it ends strictly under budget:
    // at cumk == budget a zero-token tail doc would sit exactly AT the
    // budget (before == budget), which the contract excludes — route the
    // equality case through the boundary refinement so the per-doc
    // `before < budget` filter decides it
    val full = marked.filter(col("__cumk") < budgetTokens).select("__k")
    val boundary = marked.filter(col("__cumk") >= budgetTokens)
      .select(col("__k"), col("__beforek"))
    val keptFull = keyed.join(broadcast(full), Seq("__k"))
    val wIn = Window.partitionBy("__k").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val keptBoundary = keyed.join(broadcast(boundary), Seq("__k"))
      .withColumn("__before",
        col("__beforek") + sum(col(tokenCol).cast("long")).over(wIn)
          - col(tokenCol).cast("long"))
      .filter(col("__before") < budgetTokens)
      .drop("__before", "__beforek")
    keptFull.union(keptBoundary).drop("__k")
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Exact NTILE bucket assignment over (score DESC, tie ASC) — "which
    * quality decile is this document in" — WITHOUT a corpus-wide rank
    * window. The input to mixture reweighting: assign deciles here, then
    * feed per-decile rates to [[stratifiedSample]].
    *
    * Standard SQL ntile semantics, reproduced exactly: with N rows and n
    * buckets, the first N mod n buckets hold ⌈N/n⌉ rows, the rest ⌊N/n⌋ —
    * so the output matches any engine's `ntile(n) OVER (ORDER BY score
    * DESC, tie ASC)` row-for-row (the order is total when `tie` is
    * unique). The global 0-based rank is assembled scale-safely:
    *
    *   rank = (histogram cumulative count of strictly-better scores)
    *        + (row_number within this score, ordered by tie) - 1
    *
    * — the first term from the bounded (group-free) score histogram, the
    * second from a window partitioned BY SCORE, whose partitions are tie
    * multiplicities, never the corpus. Then the closed-form ntile:
    * rank < rem·(q+1) ? rank div (q+1) : rem + (rank - rem·(q+1)) div q
    * (q = N div n, rem = N mod n), all int64.
    *
    * Same bounded-cardinality contract as [[topFracByScore]]: `score`
    * should be integer-like; a continuous double degrades the histogram to
    * ~N rows (still correct, no longer cheap). */
  def scoreNtile(df: DataFrame, scoreCol: String, tieCol: String,
                 nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    val hist = df.groupBy(scoreCol).agg(count(lit(1)).as("__c"))
    val wk = Window.orderBy(desc(scoreCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bounded histogram: cum-before per score + the global N on every row
    val marks = hist
      .withColumn("__before", sum(col("__c")).over(wk) - col("__c"))
      .withColumn("__n", sum(col("__c")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col(scoreCol).as("__s"), col("__before"), col("__n"))
    val wTie = Window.partitionBy(scoreCol).orderBy(asc(tieCol))
    // all-int64 closed form; when N < n the q=0 ELSE branch is unreachable
    // (rank < rem·1 = N always holds), so the div-by-zero never evaluates
    val ntileExpr =
      s"""CAST(CASE
         |  WHEN __rank < (__n % $nBuckets) * (__n div $nBuckets + 1)
         |  THEN __rank div (__n div $nBuckets + 1)
         |  ELSE (__n % $nBuckets)
         |     + (__rank - (__n % $nBuckets) * (__n div $nBuckets + 1))
         |       div (__n div $nBuckets)
         |END + 1 AS INT)""".stripMargin
    // null-SAFE join back: a NULL score is a legitimate histogram group
    // (desc ordering puts it last on both engines), and a plain equi-join
    // would silently drop those rows — breaking row-for-row ntile parity
    df.join(broadcast(marks), col(scoreCol) <=> col("__s"))
      .withColumn("__rank",
        col("__before") + row_number().over(wTie) - 1)
      .withColumn("bucket", expr(ntileExpr))
      .drop("__s", "__before", "__n", "__rank")
  }

  /** Dataset mixing: per-source deterministic downsampling + a lineage tag,
    * unioned. The standard way to hit a target corpus composition (e.g.
    * 30% web / 60% books / 10% code) without a shuffle: each source is
    * filtered at its own scan, and the union is a no-op in the plan. */
  def mixDatasets(sources: Seq[(String, DataFrame, Int)],
                  bpOf: DataFrame => Column): DataFrame = {
    require(sources.nonEmpty, "mixDatasets needs at least one source")
    sources.map { case (tag, df, rateBp) =>
      df.filter(bpOf(df) < lit(rateBp)).withColumn("mix_source", lit(tag))
    }.reduce(_ unionByName _)
  }

  /** Water-filling quota allocation: split a global row `budget` across
    * strata so no stratum is allocated more rows than it has, small
    * strata keep everything, and the budget freed by small strata is
    * redistributed EVENLY among the rest — the "balanced mixture with
    * cap redistribution" rule behind per-language / per-source caps
    * (the naive `budget / nStrata` share strands budget on strata
    * smaller than their share; proportional allocation lets one giant
    * crawl starve every small source).
    *
    * All-integer closed form over the strata frame sorted by
    * (n asc, stratum asc): a stratum at 1-based position j (of S, with
    * cum_{j-1} rows in smaller strata) is FULLY kept iff
    * `n_j · (S − j + 1) ≤ budget − cum_{j-1}` — the feasibility test is
    * prefix-closed under this order, so the fully-kept set is positions
    * 1..t with t = (first failing position) − 1. The remaining budget
    * R = budget − cum_t splits as `R div (S−t)` each, the first
    * `R mod (S−t)` capped strata (in the same total order) getting one
    * extra — so Σ alloc == min(budget, Σ n) EXACTLY, and the allocation
    * is deterministic and engine-replayable.
    *
    * Scale shape: one map-side-combined count per stratum, then windows
    * over the STRATA frame — bounded by the source/language count (the
    * [[graft.operators.Packing]] bounded-window precedent), never the
    * corpus. Output: (stratum, n, alloc). */
  def quotaAllocate(df: DataFrame, strataCol: String,
                    budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n"))
    val ord = Window.orderBy(asc("n"), asc(strataCol))
    val cumW = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val allW = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val marked = counts
      .withColumn("__j", row_number().over(ord))
      .withColumn("__cum", sum(col("n")).over(cumW))
      .withColumn("__s", count(lit(1)).over(allW))
      .withColumn("__full",
        col("n") * (col("__s") - col("__j") + 1) <=
          lit(budget) - (col("__cum") - col("n")))
    // t, cum_t as scalars on every row (window over the strata frame)
    val witht = marked
      .withColumn("__t", sum(when(col("__full"), 1L).otherwise(0L)).over(allW))
      .withColumn("__cumt",
        sum(when(col("__full"), col("n")).otherwise(0L)).over(allW))
    // integer div/mod via expr (Column./ is floating); the ELSE branch is
    // only evaluated on non-full rows, where __s > __t is guaranteed
    // (a non-full row exists, so t < S — no division by zero)
    witht.withColumn("alloc", expr(
        s"""CASE WHEN __full THEN n
           |ELSE ($budget - __cumt) div (__s - __t)
           |   + (CASE WHEN __j - __t <= ($budget - __cumt) % (__s - __t)
           |      THEN 1 ELSE 0 END)
           |END""".stripMargin.replace("\n", " ")))
      .select(col(strataCol), col("n"), col("alloc").cast("long").as("alloc"))
  }

  /** The selection half of [[quotaAllocate]]: exactly `alloc_s` rows per
    * stratum, chosen in ([[lcgBp]]-priority, id) order — the same
    * deterministic unbiased prefix as [[sampleKPerGroup]], with a
    * PER-STRATUM k. Shape: the typed top-k aggregator runs at
    * k = max(alloc) (map-side capped, no corpus rank window), then the
    * broadcast allocation table trims each stratum to its own quota.
    * Returns (stratum, id, rank) with rank 1..alloc_s; `maxAllocCap`
    * fails fast if the per-partition cap the aggregator buffers would
    * exceed driver-safe bounds (raise it deliberately for big budgets). */
  def quotaSample(df: DataFrame, strataCol: String, idCol: String,
                  budget: Long, maxAllocCap: Int = 1 << 22): DataFrame = {
    val alloc = quotaAllocate(df, strataCol, budget)
    // bounded driver read: one row, the max over the strata frame
    val kMaxRow = alloc.agg(max("alloc")).head()
    val kMax = if (kMaxRow.isNullAt(0)) 0L else kMaxRow.getLong(0)
    require(kMax <= maxAllocCap,
      s"max per-stratum allocation $kMax exceeds maxAllocCap $maxAllocCap")
    if (kMax <= 0L)
      df.select(col(strataCol).cast("string").as(strataCol),
        col(idCol).cast("long").as(idCol), lit(1).cast("int").as("rank"))
        .filter(lit(false))
    else {
      // null-SAFE allocation join: a NULL stratum (unattributed source) is
      // a group like any other — quotaAllocate budgets it, and a plain
      // equi-join here would silently drop its entire allocation,
      // undershooting the exact-sum contract
      val allocS = alloc.select(
        col(strataCol).cast("string").as("__st"), col("alloc"))
      sampleKPerGroup(df, strataCol, idCol, kMax.toInt)
        .join(broadcast(allocS), col(strataCol) <=> col("__st"))
        .filter(col("rank") <= col("alloc"))
        .select(col(strataCol), col(idCol), col("rank"))
    }
  }

  /** Weighted sample WITHOUT replacement, k rows with inclusion odds ∝
    * `weightCol` — Efraimidis–Spirakis (2006) exponential clocks: each row
    * draws `e = −ln(u) / w` (u a deterministic uniform from the q25
    * polynomial hash of its id) and the k SMALLEST e win. The property
    * that matters at 100 TB: the draw is a pure per-row function — no
    * global weight total, no prefix-sum pass, no normalization — so one
    * scan plus a TakeOrdered head (per-partition top-k, never a corpus
    * sort) finishes the job, and the sample is reproducible across runs,
    * partitionings, and engines (the one `ln` per row carries the
    * documented q77 ulp caveat; ranks tie-break by id).
    *
    * Scaling all weights by a constant rescales every clock by the same
    * factor — the selection is invariant, another ES property the spec
    * pins. Weights must be > 0 to hold a clock — non-positive weights are
    * ENFORCED out of candidacy here (a negative weight's ekey < 0 would
    * deterministically beat every legitimate row; a zero weight's is
    * +∞/NaN), their rows returned with keep = 0. Returns every input row
    * with its weight and a keep ∈ {0,1} flag marking the winners. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 0, s"k must be ≥ 0, got $k")
    val hv = graft.textstats.TextStats.fingerprint(col(idCol).cast("string"))
    val u = (hv + lit(1L)) / lit(1000000008.0) // (0, 1], never ln(0)
    // ekey only where the clock exists: under ANSI (the session default)
    // an unconditional division would THROW on a zero weight; the `when`
    // leaves non-positive-weight rows with a NULL ekey instead, excluded
    // from candidacy below but still returned with keep = 0
    val wd = col(weightCol).cast("double")
    val scored = df.select(col(idCol).as("id"),
      col(weightCol).cast("long").as("w"),
      when(wd > 0, -log(u) / wd).as("ekey"))
    val top = scored.filter(col("ekey").isNotNull)
      .orderBy(col("ekey").asc, col("id")).limit(k)
      .select(col("id"), lit(1L).as("keep"))
    scored.join(broadcast(top), Seq("id"), "left")
      .na.fill(0L, Seq("keep"))
      .select(col("id"), col("w"), col("keep"))
  }
}
