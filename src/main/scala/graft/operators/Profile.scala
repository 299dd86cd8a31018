package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-wide column profile: one row per column with row count, null
  * count, exact distinct count, and min/max — the data-quality gate run
  * before a corpus enters the pipeline (a column that is suddenly 40%
  * null, or whose distinct count collapses, is an upstream extraction
  * bug caught here rather than as a mystery three stages later).
  *
  * ONE aggregation computes every metric (multi-column count(DISTINCT)
  * plans through Spark's Expand — k branches for k columns, each
  * map-side combined), and the per-column layout is a plan-side melt of
  * that single row (explode over a literal struct array) — no driver
  * collect, no per-column jobs, one pass over the data. min/max surface
  * as strings so one schema fits every column type; profile only columns
  * whose string form is canonical on both engines (integers, strings —
  * not floats, whose formatting is engine-specific) when an oracle will
  * replay it. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val melted = explode(array(cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      col(s"__null_$c").as("n_null"),
      col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min_s"),
      col(s"__max_$c").as("max_s"))): _*))
    one.select(melted.as("p")).select("p.*")
  }

  /** Order-independent dataset checksum per group — the data-versioning /
    * replica-verification primitive: two pipeline stages (or two
    * clusters) holding the same logical slice produce the same
    * fingerprint regardless of row order, partitioning, or file layout.
    *
    * Per row: the q25 polynomial hash ([[graft.textstats.TextStats
    * .fingerprintBase]], portable to the SQL oracle) of the
    * '|'-concatenated `encodeCols`, in TWO independent base channels
    * (31, 37); per group: row count + the xor-fold of each channel.
    * bit_xor is commutative/associative, so the aggregate is one
    * map-side-combined pass with no ordering requirement anywhere — the
    * property a sum-based checksum only gets by risking overflow (and
    * engine-specific overflow semantics).
    *
    * PRECONDITION (documented, not patched): `encodeCols` must include a
    * unique key — xor cancels PAIRS of identical encodings, so only a
    * unique key makes "identical rows" impossible and the checksum
    * injective-in-practice. concat_ws skips NULLs identically on both
    * engines; include only columns whose string form is canonical on
    * both (integers, strings — the [[profile]] rule). */
  def datasetFingerprint(df: DataFrame, groupCol: String,
                         encodeCols: Seq[String]): DataFrame = {
    require(encodeCols.nonEmpty, "datasetFingerprint needs encode columns")
    val (h31, h37) = graft.textstats.TextStats.rowFingerprints(encodeCols)
    df.select(col(groupCol), h31.as("__h31"), h37.as("__h37"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h31)").as("fp31"),
        expr("bit_xor(__h37)").as("fp37"))
  }

  /** Key-candidate and functional-dependency discovery over DECLARED
    * columns — the profiling step schema docs lie about: which columns
    * actually identify rows (unique + never null), and which determine
    * which (a → b holds iff every a-value maps to exactly one b-value,
    * i.e. |distinct(a)| = |distinct(a, b)|). Feeds dedup-key choices,
    * join-key validation, and the Unique rules of row 163's audit.
    *
    * One aggregation computes every count (the [[profile]] discipline);
    * pair distincts canonicalize (value, value) through a sentinel-
    * coalesced chr(1)/chr(2) concat so NULL handling is identical on
    * both engines (multi-column DISTINCT treats nulls differently
    * across engines; the string canonicalization does not). The melt is
    * a plan-side stack — no driver collect. Output one row per column
    * (kind 'key') and per ordered pair (kind 'fd'):
    * (kind, subject, detail, n_rows, n_distinct, holds). An fd verdict
    * requires a TOTAL determinant (subject never null) — partial FDs
    * over a nullable determinant report holds = 0, by declared design
    * (a determinant you cannot evaluate on every row is not a usable
    * dedup/join key). */
  def keyCandidates(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty && cols.size <= 8,
      s"declare 1..8 columns, got ${cols.size}")
    def canon(c: String) =
      s"coalesce(CAST(`$c` AS STRING), char(1))"
    def pairKey(a: String, b: String) =
      s"concat(${canon(a)}, char(2), ${canon(b)})"
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    val aggs =
      cols.flatMap { c => Seq(
        countDistinct(col(c)).as(s"__d_$c"),
        count(col(c)).as(s"__nn_$c")) } ++
      pairs.map { case (a, b) =>
        countDistinct(expr(pairKey(a, b))).as(s"__p_${a}__$b") }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // stacked measures: key rows then fd rows, all computed post-agg
    val keyRows = cols.zipWithIndex.map { case (c, i) =>
      (i, "key", c, "",
        s"__d_$c",
        s"CASE WHEN __d_$c = __n AND __nn_$c = __n THEN 1 ELSE 0 END")
    }
    val fdRows = pairs.zipWithIndex.map { case ((a, b), j) =>
      (cols.size + j, "fd", a, b,
        s"__p_${a}__$b",
        s"CASE WHEN __p_${a}__$b = __d_$a AND __nn_$a = __n THEN 1 ELSE 0 END")
    }
    val rows = keyRows ++ fdRows
    val stackArgs = rows.map { case (i, _, _, _, d, h) =>
      s"$i, CAST($d AS BIGINT), CAST(($h) AS BIGINT)" }.mkString(", ")
    one.select(col("__n").as("n_rows"), expr(
        s"stack(${rows.size}, $stackArgs) AS (__j, n_distinct, holds)"))
      .select(
        element_at(array(rows.map(r => lit(r._2)): _*),
          col("__j") + 1).as("kind"),
        element_at(array(rows.map(r => lit(r._3)): _*),
          col("__j") + 1).as("subject"),
        element_at(array(rows.map(r => lit(r._4)): _*),
          col("__j") + 1).as("detail"),
        col("n_rows"), col("n_distinct"), col("holds"))
  }

  /** Column-profile drift report between two dataset versions — the
    * stats half of the schema-evolution story (row 179 reads evolved
    * schemas; this says what CHANGED): per column, presence status
    * (added / removed / common), the null-RATE shift in basis points
    * (rates, not counts — versions legitimately differ in row count),
    * the distinct-count delta, and a min/max-changed flag (null-safe
    * compare). The upstream-extraction-bug canary run between every two
    * releases: a column suddenly 40% null or with a collapsed distinct
    * count fails here, not three stages later.
    *
    * Cost: one [[profile]] pass per side (each a single aggregation) +
    * one full-outer join on the ≤ |columns| profile rows. Deltas are
    * plain integer subtractions of non-negative truncations — no sign
    * split needed anywhere. */
  def profileDiff(v1: DataFrame, cols1: Seq[String],
                  v2: DataFrame, cols2: Seq[String]): DataFrame = {
    def side(df: DataFrame, cols: Seq[String], tag: String) =
      profile(df, cols).select(
        col("column"),
        col("n_rows").as(s"rows_$tag"),
        col("n_null").as(s"null_$tag"),
        col("n_distinct").as(s"dist_$tag"),
        col("min_s").as(s"min_$tag"),
        col("max_s").as(s"max_$tag"))
    side(v1, cols1, "v1")
      .join(side(v2, cols2, "v2"), Seq("column"), "full_outer")
      .withColumn("status",
        when(col("rows_v1").isNull, lit("added"))
          .when(col("rows_v2").isNull, lit("removed"))
          .otherwise(lit("common")))
      .withColumn("null_bp_delta",
        expr("(10000 * null_v2) div rows_v2") -
          expr("(10000 * null_v1) div rows_v1"))
      .withColumn("dist_delta", col("dist_v2") - col("dist_v1"))
      .withColumn("minmax_changed",
        when(col("status") === "common",
          (!(col("min_v1") <=> col("min_v2")) ||
            !(col("max_v1") <=> col("max_v2"))).cast("long")))
      .select("column", "status", "rows_v1", "rows_v2", "null_bp_delta",
        "dist_v1", "dist_v2", "dist_delta", "minmax_changed")
  }

  /** Gini concentration of a non-negative weight across groups — the
    * single-number inequality read beside the row-227 Pareto curve: 0 =
    * perfectly even mixture, →1000 (milli) = one group carries
    * everything; the mixture-health canary a rebalancing decision hangs
    * on. Exact integers end to end: with groups ranked ascending by
    * weight (ties by group name for a total order), Gini =
    * Σ(2i−n−1)·wᵢ / (n·Σw) = (2·Σi·wᵢ − (n+1)·Σw) / (n·Σw), emitted as
    * ONE truncating division in milli-units; the numerator is ≥ 0 by
    * the rearrangement inequality under ascending order, so floor and
    * trunc agree on both engines. NULL when total weight is 0. The rank
    * window and both aggregates run over the ≤ |groups| frame — the
    * Packing bounded-window precedent, never the corpus. */
  def giniConcentration(df: DataFrame, groupCol: String,
                        weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a group whose weights are ALL NULL carries no mass: keeping it
    // would hand it rank 1 (NULLs order first asc) and inflate n_groups,
    // skewing the Gini of the real mixture
    val t = df.groupBy(groupCol)
      .agg(sum(col(weightCol)).as("__w"))
      .filter(col("__w").isNotNull)
    val ranked = t.withColumn("__i", row_number().over(
      Window.orderBy(col("__w").asc, col(groupCol).asc)).cast("long"))
    ranked.agg(count(lit(1)).as("n_groups"),
        sum("__w").as("total_w"),
        sum(expr("__i * __w")).as("__ia"))
      .select(col("n_groups"), col("total_w"),
        when(col("total_w") > 0, expr(
          "(1000 * (2 * __ia - (n_groups + 1) * total_w)) div " +
            "(n_groups * total_w)")).as("gini_m"))
  }

  /** Gini–Simpson diversity index — the single-number "how mixed is
    * this group across categories" read (per-source language diversity,
    * per-user behavioral diversity): 10000·(1 − Σc²/n²) in bp — 0 = one
    * category, →10000 = perfectly spread; the exact integer alternative
    * to Shannon entropy (whose log leaves the integer discipline).
    * simpson_bp = 10000 − (10000·Σc²) div n², products in decimal(38,0);
    * one category-bounded count aggregate then one per-group fold. */
  def diversityIndex(df: DataFrame, groupCol: String,
                     catCol: String): DataFrame =
    diversityFromCounts(
      df.filter(col(groupCol).isNotNull && col(catCol).isNotNull)
        .groupBy(col(groupCol).as("grp"), col(catCol).as("__c"))
        .agg(count(lit(1)).as("__n")))

  /** The fold half of [[diversityIndex]] over a pre-reduced
    * (grp, category, __n) count frame — shared with the streaming
    * category monitor (category counts are additive, so the drained
    * index equals the batch index exactly). */
  def diversityFromCounts(counts: DataFrame): DataFrame =
    counts
      .groupBy("grp")
      .agg(sum("__n").as("n"),
        count(lit(1)).as("n_cats"),
        sum(expr("cast(__n as decimal(38,0)) * __n")).as("__s2"))
      .withColumn("simpson_bp", expr(
        "cast(10000 - (10000 * __s2) div " +
          "(cast(n as decimal(38,0)) * n) as bigint)"))
      .select("grp", "n", "n_cats", "simpson_bp")

  /** Pareto coverage of a (source, tokens) mass frame — ranked shares
    * with cumulative share in bp (the row-227 read, factored so the
    * batch rollup and the streaming token monitor share one
    * definition); every window runs over the ≤ |sources| frame. */
  def paretoCoverage(masses: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.orderBy(col("tokens").desc, col("source").asc)
    masses
      .withColumn("rank", row_number().over(ord).cast("int"))
      .withColumn("__cum", sum("tokens").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tot", sum("tokens").over(
        ord.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("share_bp", expr("(10000 * tokens) div __tot"))
      .withColumn("cum_share_bp", expr("(10000 * __cum) div __tot"))
      .select("source", "tokens", "rank", "share_bp", "cum_share_bp")
  }

  /** Shard-balance audit — the partitioning-key pre-flight: rows hash
    * to `nShards` buckets via the portable q25 polynomial (engine- and
    * oracle-replayable, unlike Murmur3) and each shard reports its row
    * count with the signed deviation from the ideal share in bp
    * (dev_bp = (10000·n·shards) div total − 10000; an empty shard reads
    * −10000, a hot one far positive — the "is my key skewed before I
    * bucket 100 TB by it" read beside row 155's join-skew report).
    * Empty shards are explicit rows (the grid fills from the shard
    * range, not from observed data). */
  def shardBalance(df: DataFrame, keyCol: String,
                   nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val counts = df.filter(col(keyCol).isNotNull)
      .select((graft.textstats.TextStats.fingerprintBase(
        col(keyCol).cast("string"), 31) % nShards).as("shard"))
      .groupBy("shard").agg(count(lit(1)).as("n"))
    val grid = counts.agg(sum("n").as("__tot"))
      .select(col("__tot"),
        explode(sequence(lit(0L), lit(nShards - 1L))).as("shard"))
    grid.join(counts, Seq("shard"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("dev_bp",
        expr(s"(10000 * n * $nShards) div __tot - 10000"))
      .select("shard", "n", "dev_bp")
  }

  /** Exact per-group mode — the most frequent value with a
    * deterministic tie (higher count wins, then the SMALLER value — a
    * total order both engines share): the categorical imputation /
    * "dominant value" read SQL's MODE() leaves tie-undefined. Computed
    * on the (group, value) count frame with a rank window over each
    * group's DISTINCT values — bounded by value cardinality, never
    * rows. NULL values are excluded (absence is not a mode). */
  def groupMode(df: DataFrame, groupCol: String,
                valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.filter(col(groupCol).isNotNull && col(valCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(valCol).as("mode_value"))
      .agg(count(lit(1)).as("n_mode"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("grp")
          .orderBy(col("n_mode").desc, col("mode_value").asc)))
      .filter(col("__rk") === 1)
      .select("grp", "mode_value", "n_mode")
  }
}
