package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact duplicated-span REMOVAL — the scrub half of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better", §4 exact
  * substring dedup): [[Decontaminate.duplicateSpans]] reports how much of
  * each document is corpus-duplicated; this operator actually rewrites the
  * text, deleting every token covered by an n-gram that occurs ≥ 2 times
  * in the corpus (counting multiplicity, so within-doc repeats scrub too).
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
  *      with 1), then explode to ≤ n covered positions per start and
  *      collect_set per doc — ints only;
  *   3. the rewrite joins the per-doc covered-position arrays back to the
  *      corpus and filters tokens IN THE ROW (higher-order functions, no
  *      token explode): docs with no duplicated span pass through the left
  *      join untouched. The covered side carries only (id, array<int>) and
  *      is left to AQE — typically a broadcast, since only dup-bearing
  *      docs appear; the corpus-side exchange happens only if AQE declines,
  *      and is the one unavoidable text move of a rewrite operator.
  */
object SpanScrub {

  /** (id, clean_text, n_tok, n_removed): `textCol` with every token inside
    * a corpus-duplicated `n`-gram removed; `n_removed` counts scrubbed
    * tokens. Fully-duplicated documents come back as empty strings (the
    * Lee-et-al semantics: the span is deleted everywhere it occurs). */
  def scrubDuplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 8): DataFrame = {
    require(n >= 2, s"span gram size must be >= 2, got $n")
    val spark = docs.sparkSession
    val toked = docs.select(col(idCol).as("id"),
      TextFunctions.tokens(col(textCol)).as("toks"))
    val posGrams = toked.select(col("id"), size(col("toks")).as("nt"),
      posexplode(graft.functions.ShingleHashes(spark, col("toks"), n)))
      .withColumnsRenamed(Map("pos" -> "p", "col" -> "g"))
    val occ = posGrams.groupBy("g").agg(count(lit(1)).as("occ"))
    // covered token positions per doc: each duplicated gram start covers
    // p..p+n-1 (the whole doc for the collapsed short-doc gram)
    val covered = posGrams.join(occ, "g")
      .filter(col("occ") >= 2)
      .select(col("id"),
        explode(sequence(col("p"),
          least(col("p") + lit(n - 1), col("nt") - 1))).as("cp"))
      .groupBy("id").agg(collect_set("cp").as("cov"))
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
  }
}
