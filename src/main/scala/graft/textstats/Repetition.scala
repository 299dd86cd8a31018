package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Repetition / boilerplate scoring — the Gopher-style (Rae et al. 2021,
  * "Scaling Language Models", app. A1) signals a training-data pipeline
  * filters on: duplicate-line fraction, distinct-token fraction, and the
  * share of the document covered by its single most frequent token/bigram.
  *
  * Two execution shapes, chosen per signal:
  *
  *   - Per-row signals ([[distinctTokenBp]], [[dupLineBp]]) are pure
  *     Catalyst array expressions — no shuffle, embarrassingly parallel.
  *   - Per-document mode statistics ([[topNgramStats]]) need a
  *     count-per-(doc, gram) which is NOT per-row array work: a HOF
  *     formulation (for each element, count its occurrences) is O(len²)
  *     per document. Instead: explode → two-level groupBy. Both
  *     aggregations get map-side partial aggregation, the shuffle carries
  *     (doc, gram, count) — linear in token count, the 100 TB shape.
  *
  * All ratios ride as integer basis points (`floor(10000·x)`), the repo's
  * standard for bit-exact cross-engine oracles (a rounded double diverges
  * between engines on ties).
  */
object Repetition {

  /** distinct tokens / tokens, in basis points. Low values ⇒ the document
    * keeps repeating the same words (boilerplate, keyword stuffing). */
  def distinctTokenBp(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    floor(lit(10000) * size(array_distinct(toks)).cast("double") /
      size(toks).cast("double")).cast("long")
  }

  /** Fraction of lines that are duplicates of an earlier line, in basis
    * points; 0 for single-line documents. */
  def dupLineBp(text: Column): Column = {
    val lines = split(text, "\n")
    floor(lit(10000) * (size(lines) - size(array_distinct(lines))).cast("double") /
      size(lines).cast("double")).cast("long")
  }

  /** Adjacent-token bigrams as strings; empty array below 2 tokens. */
  private def bigrams(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** (id, top_cnt): occurrence count of the most frequent gram per id —
    * the shared explode → two-level-partial-agg mode statistic. */
  private def topModeCount(grams: DataFrame, outCol: String): DataFrame =
    grams.groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(max("c").as(outCol))

  /** Per-document repetition statistics:
    * (id, n_tokens, distinct_bp, top_token_cnt, top_bigram_cnt).
    *
    * `top_token_cnt` / `top_bigram_cnt` are the occurrence counts of the
    * most frequent unigram/adjacent-bigram (the max COUNT is unique even
    * when the arg-max gram is tied, keeping the output deterministic).
    * Documents with < 2 tokens report top_bigram_cnt = 0. */
  def topNgramStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the tokenize pass feeds THREE branches (per-row stats, unigram agg,
    // bigram agg) — a diamond plan Catalyst won't collapse; persist it once
    // per the repo's diamond rule (MinHashDedup, NGramJaccard, histogram)
    val toks = graft.Guards.materialize(df.select(col(idCol).as("id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks"))))

    val topUni = topModeCount(
      toks.select(col("id"), explode(col("toks")).as("g")), "top_token_cnt")

    val topBi = topModeCount(
      toks.select(col("id"), explode(bigrams(col("toks"))).as("g")),
      "top_bigram_cnt")

    toks
      .select(col("id"), col("n_tokens"),
        floor(lit(10000) * size(array_distinct(col("toks"))).cast("double") /
          col("n_tokens").cast("double")).cast("long").as("distinct_bp"))
      .join(topUni, Seq("id"), "left")
      .join(topBi, Seq("id"), "left")
      .select(col("id"), col("n_tokens"), col("distinct_bp"),
        coalesce(col("top_token_cnt"), lit(0L)).as("top_token_cnt"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"))
  }

  /** Character-level mode statistic (the char half of Gopher's repetition
    * battery): (id, n_chars, top_char_ngram_cnt) where the count is of the
    * most frequent n-char window. Texts shorter than n count as one
    * whole-text gram. Window enumeration is the native rolling
    * [[graft.functions.CharGramHashes]] expression — one code-point walk
    * per row, windows hashed in place (the earlier `substr` formulation
    * copied O(len·n) bytes through two interpreted lambdas), and the
    * explode/groupBy counts 8-byte longs instead of n-char strings. Mode
    * counts over hashes equal mode counts over grams absent a
    * within-document XXH64 collision (P ≈ pairs·2⁻⁶⁴; RepetitionSpec
    * cross-checks against the substr formulation on real corpus text). */
  def topCharNgramStats(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 4): DataFrame = {
    require(n >= 1)
    val t = col(textCol)
    // two cheap source scans, NOT one staged frame carrying the exploded
    // gram array through a join (persisting ~n× the text per row is worse
    // than re-reading the column-pruned scan)
    val base = df.select(col(idCol).as("id"), length(t).cast("long").as("n_chars"))
    // NULL text must still emit ONE gram row (g = null, mode count 1): the
    // oracle's CASE falls to [text] = [NULL] and counts it, and the old
    // substr formulation did the same. CharGramHashes is null-in-null-out
    // (the expression convention), so explode alone would DROP the row and
    // coalesce to 0 — a silent engine/oracle divergence on null-bearing
    // corpora.
    val gramRows = df.select(col(idCol).as("id"),
      explode(when(t.isNull, array(lit(null).cast("long")))
        .otherwise(graft.functions.CharGramHashes(df.sparkSession, t, n)))
        .as("g"))
    base
      .join(topModeCount(gramRows, "top_char_ngram_cnt"), Seq("id"), "left")
      .select(col("id"), col("n_chars"),
        coalesce(col("top_char_ngram_cnt"), lit(0L)).as("top_char_ngram_cnt"))
  }

  /** Generation-loop detector — exact tail periodicity: a decoding loop
    * emits a cycling suffix ("... and the and the and the"), which gram
    * statistics only see indirectly. A string has period p when every
    * character equals the one p positions later — checked EXACTLY by one
    * substring self-comparison per candidate p (no hashes, so both
    * engines agree by construction): substr(t, 1, L−p) = substr(t, p+1,
    * L−p). The check runs on the LAST `tailChars` characters (loops live
    * at the end of a generation) for p in 1..`maxPeriod`; the smallest
    * qualifying p is reported.
    *
    * (id, tail_period, loop): tail_period = min qualifying p (0 when the
    * tail is aperiodic), loop = 1 iff a period exists AND the document
    * actually fills the tail window (short docs never flag — a 3-char doc
    * with period 1 is not a runaway generation). Pure per-row expression
    * work, zero shuffles, O(tailChars · maxPeriod) per doc. */
  def loopSignal(df: DataFrame, idCol: String, textCol: String,
                 tailChars: Int = 64, maxPeriod: Int = 16): DataFrame = {
    require(tailChars >= 2 && maxPeriod >= 1 && maxPeriod < tailChars,
      s"need 2 <= maxPeriod+1 <= tailChars, got $tailChars/$maxPeriod")
    df.select(col(idCol).as("id"), col(textCol).as("__t"))
      .withColumn("__tl", expr(
        s"CASE WHEN length(__t) >= $tailChars " +
          s"THEN substring(__t, length(__t) - ${tailChars - 1}, $tailChars) " +
          "ELSE __t END"))
      .withColumn("__ps", expr(
        s"filter(sequence(1, $maxPeriod), p -> length(__tl) > p AND " +
          "substring(__tl, 1, length(__tl) - p) = " +
          "substring(__tl, p + 1, length(__tl) - p))"))
      .select(col("id"),
        // try_element_at: ANSI element_at throws on the empty (aperiodic)
        // array
        expr("CAST(coalesce(try_element_at(__ps, 1), 0) AS INT)")
          .as("tail_period"),
        expr(s"CASE WHEN size(__ps) > 0 AND length(__t) >= $tailChars " +
          "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END").as("loop"))
  }
}
