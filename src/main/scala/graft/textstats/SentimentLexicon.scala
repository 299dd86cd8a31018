package graft.textstats

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexicon-based (rule-based) sentiment scoring — the Spark-native
  * re-expression of the reference's NLTK VADER pass
  * (/root/reference/Scalable_EDA_Final.py:379-386: a Python UDF applying
  * `SentimentIntensityAnalyzer().polarity_scores(text)['compound']` per
  * review, then a histogram of the scores). The reference ships the
  * lexicon inside an opaque Python library call; here the lexicon IS
  * DATA — a (term, valence_m) frame joined broadcast onto the token
  * stream — so the whole scorer is declarative, codegen'd, and exactly
  * replayable by a SQL oracle (no model, no library, no UDF).
  *
  * Semantics (integer-exact, engine-portable):
  *
  *  - tokens: the row-8/row-17 convention — `TextFunctions.tokens`
  *    (strip punct/digits → squeeze → trim → lower → split on space);
  *  - each token matching a lexicon term contributes its milli-valence
  *    (VADER's [−4, 4] mean-valence scale × 1000);
  *  - negation flip: when the IMMEDIATELY preceding token is a negator,
  *    the contribution is `−((740 · v) div 1000)` — the published VADER
  *    N_SCALAR = −0.74 damping in truncating integer milli-units (Spark
  *    `div` and DuckDB `//` both truncate toward zero, so the flip is
  *    bit-identical). Because the row-8 cleaner splits apostrophes
  *    ("don't" → `don t`), the orphaned `t` token is itself a negator —
  *    that is how n't-contractions negate their successor;
  *  - compound_m = floor(10⁴ · s ∕ √(s² + 15·10⁶)) where s = Σ valence_m
  *    — VADER's compound normalization (α = 15 on the valence scale =
  *    15·10⁶ in milli² units). The only floating math is one multiply,
  *    one fused square-add, one sqrt and one divide, every one of them
  *    correctly rounded under IEEE 754, and the expression is written
  *    with the same operation order in both engines — so unlike a
  *    transcendental (the q77 ln caveat) the floor is reproducible
  *    bit-for-bit and the oracle is EXACT.
  *
  * Scale shape: the lexicon broadcasts (it is dictionary-sized by
  * definition); (token, prev-token) pairs are built IN-ROW with
  * `transform` over the token array — no window, so corpus text never
  * shuffles and there is no per-token exchange; the only shuffle is the
  * final map-side-combined per-doc sum (~1 row per doc per partition).
  * Docs with zero lexicon hits keep (n_hits 0, valence_m 0, compound_m
  * 0) through the left join — every doc has ≥ 1 token under the
  * split("") = [""] convention, so no doc drops.
  */
object SentimentLexicon {

  /** Built-in demonstration lexicon: (term, milli-valence on the
    * [−4000, 4000] scale). Hand-curated review vocabulary — the
    * operator takes ANY (term, valence_m) frame; this default makes the
    * scorer usable out of the box and keeps the oracle self-contained. */
  val defaultEntries: Seq[(String, Int)] = Seq(
    // positive
    "good" -> 1900, "great" -> 3100, "excellent" -> 3400,
    "amazing" -> 2800, "awesome" -> 3100, "love" -> 3200,
    "loved" -> 2900, "like" -> 1500, "liked" -> 1700, "best" -> 3200,
    "better" -> 1900, "nice" -> 1800, "happy" -> 2700,
    "delicious" -> 3000, "tasty" -> 2400, "fresh" -> 1700,
    "friendly" -> 2200, "helpful" -> 2100, "recommend" -> 2000,
    "recommended" -> 2100, "perfect" -> 3100, "wonderful" -> 2900,
    "fantastic" -> 3300, "favorite" -> 2300, "enjoy" -> 2200,
    "enjoyed" -> 2300, "beautiful" -> 2700, "clean" -> 1600,
    "fast" -> 1300, "polite" -> 1900, "worth" -> 1400,
    "impressive" -> 2500, "solid" -> 1200, "superb" -> 3100,
    "pleasant" -> 2000, "gem" -> 2200, "fun" -> 2300, "win" -> 1800,
    // negative
    "bad" -> -2500, "worst" -> -3400, "terrible" -> -3100,
    "horrible" -> -3200, "awful" -> -3000, "hate" -> -2700,
    "hated" -> -2900, "poor" -> -2200, "slow" -> -1300,
    "dirty" -> -2000, "rude" -> -2600, "disappointing" -> -2300,
    "disappointed" -> -2200, "mediocre" -> -1500, "bland" -> -1400,
    "overpriced" -> -1800, "expensive" -> -1100, "waited" -> -700,
    "cold" -> -800, "stale" -> -1700, "gross" -> -2400,
    "disgusting" -> -3200, "avoid" -> -1900, "broken" -> -1600,
    "wrong" -> -1500, "problem" -> -1400, "problems" -> -1500,
    "complaint" -> -1600, "refund" -> -1200, "scam" -> -2900,
    "dishonest" -> -2600, "nasty" -> -2500, "noisy" -> -1100,
    "cramped" -> -1000, "unfriendly" -> -2100, "unhelpful" -> -2000,
    "worse" -> -2100, "waste" -> -2200, "boring" -> -1300,
    "ruined" -> -2400, "failure" -> -2300, "fail" -> -1900,
    "failed" -> -2000)

  /** Tokens that flip (and damp) the valence of their successor.
    * Disjoint from the lexicon terms by construction. `t` catches
    * n't-contractions after the apostrophe-stripping cleaner. */
  val negators: Seq[String] = Seq(
    "not", "no", "never", "none", "neither", "nor", "cannot",
    "without", "hardly", "barely", "t")

  /** The default lexicon as a DataFrame — the shape `score` expects. */
  def defaultLexicon(spark: SparkSession): DataFrame = {
    import spark.implicits._
    defaultEntries.toDF("term", "valence_m")
  }

  /** SQL-literal quoting for lexicon/negator terms: doubles embedded
    * single quotes, so a term like `ain't` builds a valid literal in
    * the in-row IN-lists and the oracle VALUES/IN clauses alike. */
  private def sqlQuote(s: String): String = s.replace("'", "''")

  /** Per-document sentiment: (id, n_tokens, n_hits, valence_m,
    * compound_m). `lexicon` must carry (term, valence_m) with DISTINCT
    * terms — a duplicated term would contribute once per row through
    * this join but only once through [[rowBuckets]]'s map literal,
    * silently breaking the spec-pinned score==rowBuckets equality
    * (rowBuckets enforces the same contract eagerly; here the lexicon
    * is a DataFrame, so the contract is documented rather than paid
    * for with an extra count job per call).
    *
    * Negation rides as a PER-ROW POSITION ARRAY, not a (tok, prev)
    * struct stream: `negpos` = the (few) positions holding a negator,
    * computed in-row, then plain `posexplode` of the token array — a
    * matched token at position p is flipped iff p−1 ∈ negpos. Measured
    * 4–5× faster than exploding an array of (tok, prev) structs
    * (Generate's per-row struct copy dominated the whole query); the
    * exploded row carries only (small-int array, long, pos, token). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lexicon: DataFrame): DataFrame = {
    val negList = negators.map(n => s"'${sqlQuote(n)}'").mkString(", ")
    val toks = docs
      .select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("negpos", expr("filter(sequence(0, size(toks) - 1), " +
        s"i -> element_at(toks, i + 1) IN ($negList))"))
    val posexp = toks.select(col("id"),
      size(col("toks")).cast("long").as("n_tokens"),
      col("negpos"), posexplode(col("toks")))
    posexp
      .join(broadcast(lexicon), posexp("col") === lexicon("term"), "left")
      .groupBy("id")
      .agg(max("n_tokens").as("n_tokens"),
        count(col("valence_m")).as("n_hits"),
        coalesce(sum(when(array_contains(col("negpos"), col("pos") - 1),
            expr("-((740 * valence_m) div 1000)"))
          .otherwise(col("valence_m"))), lit(0L)).as("valence_m"))
      .withColumn("compound_m", expr(
        "cast(floor((10000.0 * valence_m) / " +
          "sqrt(cast(valence_m as double) * valence_m + 15000000.0)) " +
          "as bigint)"))
  }

  /** Fully IN-ROW (grp, bucket) per document — the STREAMING-side
    * formulation: the lexicon rides as a map LITERAL in the plan
    * (dictionary-sized by definition), per-position contributions fold
    * with the SAME truncating-integer negation flip and IEEE compound
    * as [[score]], and there is no explode and no aggregation — every
    * row of a micro-batch stream buckets statelessly, so per-(grp,
    * bucket) counts are ADDITIVE across any batch split and a drained
    * monitor equals the batch [[distribution]] exactly. Null-text docs
    * drop, matching the batch path's explode-of-null. Equality with
    * score→distribution is spec-pinned. */
  def rowBuckets(docs: DataFrame, groupCol: String, textCol: String,
                 entries: Seq[(String, Int)] = defaultEntries): DataFrame = {
    require(entries.map(_._1).distinct.size == entries.size,
      "lexicon terms must be distinct (a duplicate would double-count in " +
        "score's join but keep one value in this map literal)")
    val negList = negators.map(n => s"'${sqlQuote(n)}'").mkString(", ")
    val lexMap = map_from_arrays(
      lit(entries.map(_._1).toArray),
      lit(entries.map(_._2.toLong).toArray))
    docs
      .select(col(groupCol).as("grp"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull)
      .withColumn("negpos", expr("filter(sequence(0, size(toks) - 1), " +
        s"i -> element_at(toks, i + 1) IN ($negList))"))
      .withColumn("__lex", lexMap)
      .withColumn("valence_m", expr(
        """aggregate(
          |  filter(transform(sequence(0, size(toks) - 1),
          |    i -> named_struct('i', i,
          |      'v', element_at(__lex, element_at(toks, i + 1)))),
          |    s -> s.v IS NOT NULL),
          |  0L,
          |  (acc, x) -> acc + CASE WHEN array_contains(negpos, x.i - 1)
          |    THEN -((740 * x.v) div 1000) ELSE x.v END)""".stripMargin))
      .withColumn("bucket", expr(
        "(cast(floor((10000.0 * valence_m) / " +
          "sqrt(cast(valence_m as double) * valence_m + 15000000.0)) " +
          "as bigint) + 10000) div 2000"))
      .select("grp", "bucket")
  }

  /** The reference's histogram read (Scalable_EDA_Final.py:388): per
    * group, fixed-width compound buckets (width 2000 milli over
    * [−10⁴, 10⁴] → bucket = (compound_m + 10⁴) div 2000 ∈ [0, 9]) with
    * counts — the plot's data, exactly. `scored` is [[score]] output
    * joined with a group column. */
  def distribution(scored: DataFrame, groupCol: String): DataFrame =
    scored
      .select(col(groupCol).as("grp"),
        expr("(compound_m + 10000) div 2000").as("bucket"))
      .groupBy("grp", "bucket")
      .agg(count(lit(1)).as("n"))

  /** The lexicon VALUES literal for the SQL oracle — one source of
    * truth with [[defaultEntries]]. */
  def lexiconSqlValues: String =
    defaultEntries.map { case (t, v) => s"('${sqlQuote(t)}', $v)" }.mkString(", ")

  /** The negator IN-list literal for the SQL oracle. */
  def negatorsSqlList: String =
    negators.map(n => s"'${sqlQuote(n)}'").mkString(", ")
}
