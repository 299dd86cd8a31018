package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact duplicated-span REMOVAL — the scrub half of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better", §4 exact
  * substring dedup): [[Decontaminate.duplicateSpans]] reports how much of
  * each document is corpus-duplicated; these operators actually rewrite the
  * text. Two granularities:
  *
  *   - [[scrubDuplicateSpans]] deletes every token covered by an n-gram
  *     that occurs ≥ 2 times in the corpus (counting multiplicity, so
  *     within-doc repeats scrub too) — the aggressive gram-level scrub;
  *   - [[scrubLongDuplicateSpans]] deletes only tokens inside MAXIMAL
  *     duplicated runs of ≥ `minTokens` tokens — the paper's published
  *     granularity (50 tokens), which leaves short incidental shared
  *     phrases (idioms, named entities) alone and removes only the long
  *     boilerplate/license/navigation blocks memorization studies target.
  *
  * Training on the scrubbed corpus is the published mitigation for
  * memorization of boilerplate/licenses/navigation chrome.
  *
  * Positions, not sets: the native [[graft.functions.ShingleHashes]] pass
  * emits the per-POSITION gram-hash stream (index p = hash of tokens
  * p..p+n-1; docs shorter than n collapse to one whole-array gram, whose
  * scrub unit is the whole document). Duplicated-gram occurrence counts
  * use the usual 64-bit hash equality ≈ gram equality argument
  * (collisions ~|grams|²/2⁶⁵ — the q18/q84 statement).
  *
  * Scale shape — TEXT NEVER SHUFFLES FOR THE ANALYSIS:
  *   1. gram occurrence counts — one (gram-hash) shuffle of longs,
  *      map-side combined;
  *   2. dup starts join back on the same gram-hash key (co-partitioned
  *      with 1), then explode to covered positions and collect_set per
  *      doc — ints only (the long-span variant first folds starts into
  *      maximal runs with a window over ONLY the duplicated starts);
  *   3. the rewrite joins the per-doc covered-position arrays back to the
  *      corpus and filters tokens IN THE ROW (higher-order functions, no
  *      token explode): docs with no duplicated span pass through the left
  *      join untouched. The covered side carries only (id, array<int>) and
  *      is left to AQE — typically a broadcast, since only dup-bearing
  *      docs appear; the corpus-side exchange happens only if AQE declines,
  *      and is the one unavoidable text move of a rewrite operator.
  */
object SpanScrub {

  /** (id, toks): the one tokenize pass every stage shares. */
  private def tokedFrame(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))

  /** (id, nt, p, g): per-position gram-hash stream. */
  private def posGramFrame(toked: DataFrame, k: Int): DataFrame =
    toked.select(col("id"), size(col("toks")).as("nt"),
      posexplode(graft.functions.ShingleHashes(toked.sparkSession,
        col("toks"), k)))
      .withColumnsRenamed(Map("pos" -> "p", "col" -> "g"))

  /** Maximal runs of corpus-duplicated gram starts covering ≥ `minTokens`
    * tokens, as (id, span_start, span_end, span_tok) — 0-based inclusive. */
  private def spansFrame(pg: DataFrame, k: Int, minTokens: Int): DataFrame = {
    val occ = pg.groupBy("g").agg(count(lit(1)).as("occ"))
    val dupStarts = pg.join(occ, "g")
      .filter(col("occ") >= 2)
      .select("id", "nt", "p")
    // p − row_number() is constant exactly within a run of consecutive
    // duplicated starts; a run p1..p2 covers tokens p1..min(p2+k−1, nt−1).
    // The window partitions ONLY duplicated starts, bounded per doc by doc
    // length — never a corpus-wide frame.
    val run = Window.partitionBy("id").orderBy("p")
    dupStarts
      .withColumn("grp", col("p") - row_number().over(run))
      .groupBy("id", "grp")
      .agg(min("p").as("span_start"), max("p").as("p2"), max("nt").as("nt"))
      .withColumn("span_end", least(col("p2") + lit(k - 1), col("nt") - 1))
      .withColumn("span_tok", col("span_end") - col("span_start") + 1)
      .filter(col("span_tok") >= minTokens)
      .select(col("id"), col("span_start"), col("span_end"), col("span_tok"))
  }

  /** Rewrite: delete tokens whose 0-based position is in `covered`
    * (id, cov: array<int>); docs absent from `covered` pass through the
    * left join untouched. In-row HOF filter — no token explode. */
  private def rewrite(toked: DataFrame, covered: DataFrame): DataFrame =
    toked.join(covered, Seq("id"), "left")
      .select(col("id"), col("toks"),
        coalesce(col("cov"), array().cast("array<int>")).as("cov"))
      .withColumn("kept", filter(
        zip_with(col("toks"),
          sequence(lit(0), size(col("toks")) - 1),
          (t, i) => struct(t.as("t"), i.as("i"))),
        s => !array_contains(col("cov"), s.getField("i"))))
      .select(col("id"),
        concat_ws(" ", transform(col("kept"), _.getField("t")))
          .as("clean_text"),
        size(col("toks")).as("n_tok"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"))

  /** (id, clean_text, n_tok, n_removed): `textCol` with every token inside
    * a corpus-duplicated `n`-gram removed; `n_removed` counts scrubbed
    * tokens. Fully-duplicated documents come back as empty strings (the
    * Lee-et-al semantics: the span is deleted everywhere it occurs). */
  def scrubDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 8): DataFrame = {
    require(n >= 2, s"span gram size must be >= 2, got $n")
    val toked = tokedFrame(docs, idCol, textCol)
    val pg = posGramFrame(toked, n)
    val occ = pg.groupBy("g").agg(count(lit(1)).as("occ"))
    // covered token positions per doc: each duplicated gram start covers
    // p..p+n-1 (the whole doc for the collapsed short-doc gram)
    val covered = pg.join(occ, "g")
      .filter(col("occ") >= 2)
      .select(col("id"),
        explode(sequence(col("p"),
          least(col("p") + lit(n - 1), col("nt") - 1))).as("cp"))
      .groupBy("id").agg(collect_set("cp").as("cov"))
    rewrite(toked, covered)
  }

  /** LONG duplicated spans — the detection half of Lee et al. §4 at their
    * published span length (50 tokens): one row `(doc_id, span_start,
    * span_end, span_tok)` per maximal run of corpus-duplicated `k`-gram
    * starts covering ≥ `minTokens` tokens (positions 0-based inclusive).
    * A duplicated substring of length L ≥ `minTokens` produces L−k+1
    * consecutive duplicated starts, so no qualifying span is missed; a
    * run whose grams match DIFFERENT partners can chain into one reported
    * span (the documented over-approximation every gram-seeded distributed
    * variant of the suffix-array pass accepts — the union is still exactly
    * the text [[scrubDuplicateSpans]] would delete at gram size k).
    *
    * Scale shape: gram counting is the q108 pass (hash shuffle, map-side
    * combined); run detection windows ONLY the duplicated starts — the
    * exchange carries (id, p, nt) ints bounded by the duplicated-position
    * count, and the per-doc partition is bounded by doc length, never the
    * corpus. Short docs (< k tokens) collapse to a whole-doc gram whose
    * span is nt < k ≤ `minTokens` tokens and never qualifies. */
  def longDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 8, minTokens: Int = 50): DataFrame = {
    require(k >= 2, s"span gram size must be >= 2, got $k")
    require(minTokens >= k,
      s"minTokens must be >= gram size $k, got $minTokens")
    spansFrame(posGramFrame(tokedFrame(docs, idCol, textCol), k),
      k, minTokens)
  }

  /** The scrub at the paper's granularity: (id, clean_text, n_tok,
    * n_removed) with ONLY tokens inside ≥ `minTokens`-token maximal
    * duplicated runs removed — [[scrubDuplicateSpans]] restricted to
    * [[longDuplicateSpans]]'s spans. A phrase duplicated for ≥ k but
    * < `minTokens` consecutive tokens survives here (and is removed by
    * the gram-level scrub) — the published length cutoff that separates
    * boilerplate from incidental shared phrases. */
  def scrubLongDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                              k: Int = 8, minTokens: Int = 50): DataFrame = {
    require(k >= 2, s"span gram size must be >= 2, got $k")
    require(minTokens >= k,
      s"minTokens must be >= gram size $k, got $minTokens")
    val toked = tokedFrame(docs, idCol, textCol)
    val spans = spansFrame(posGramFrame(toked, k), k, minTokens)
    val covered = spans.select(col("id"),
        explode(sequence(col("span_start"), col("span_end"))).as("cp"))
      .groupBy("id").agg(collect_set("cp").as("cov"))
    rewrite(toked, covered)
  }
}
