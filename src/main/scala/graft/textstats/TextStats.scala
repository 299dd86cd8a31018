package graft.textstats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All per-row Catalyst expressions — embarrassingly parallel, no shuffles,
  * no UDFs — so they compose under any scan and stay inside whole-stage
  * codegen at 100 TB.
  */
object TextStats {

  /** Tiny English stopword core used for ratio features (kept deliberately
    * small and explicit so the DuckDB oracle can mirror it verbatim). */
  val stopwordCore: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it")

  /** Marker words per language for the heuristic language-ID. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "es" -> Seq("el", "la", "que"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "et"))

  /** Heuristic language ID: count marker-word hits per language over the
    * token set, pick the best with a deterministic preference order
    * (en > es > de > fr), 'und' when nothing matches. */
  def langId(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val scores: Seq[(String, Column)] = langMarkers.map { case (lang, ms) =>
      lang -> ms.map(m =>
        when(array_contains(toks, m), lit(1)).otherwise(lit(0))).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best === 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Whitespace token count (`\s+` split of trimmed text). */
  def wsTokenCount(text: Column): Column =
    size(split(trim(text), TextFunctions.wsRun))

  /** BPE-ish subword count: runs of letters, runs of digits, or single
    * non-alphanumeric glyphs — a deterministic stand-in for a real BPE
    * vocabulary's pre-tokenizer. */
  val bpeishPattern: String = """[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"""
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Fraction of characters that are punctuation/digit/control. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text,
        TextFunctions.punctDigitsClass, ""))).cast("double") /
        length(text).cast("double"))

  /** Fraction of tokens that are core stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = split(lower(trim(text)), TextFunctions.wsRun)
    val hits = size(filter(toks, t => t.isin(stopwordCore: _*)))
    hits.cast("double") / size(toks).cast("double")
  }

  /** Composite quality score in basis points [0, 10000]:
    * length credit (chars capped at 500, ×20) × non-stopword token fraction.
    * Integer-derived on purpose: every intermediate is an exact integer in
    * double range, the one division is IEEE-deterministic, and `floor` kills
    * the round-half tie-breaking divergence between engines — so the value
    * hash-matches the DuckDB oracle bit-for-bit (a `round(double, 4)` here
    * differed on ~0.4% of rows purely from rounding-mode semantics). */
  def qualityScore(text: Column): Column = {
    val toks = split(lower(trim(text)), TextFunctions.wsRun)
    val hits = size(filter(toks, t => t.isin(stopwordCore: _*)))
    val lenCredit = least(length(text), lit(500)) * lit(20)
    floor(lenCredit.cast("double") * (size(toks) - hits).cast("double") /
      size(toks).cast("double")).cast("long")
  }

  /** Polynomial rolling hash of the whole document (mod 1e9+7, base 31) —
    * a content fingerprint computed per row. */
  def fingerprint(text: Column): Column = fingerprintBase(text, 31)

  /** [[fingerprint]] with a chosen polynomial base: independent bases give
    * independent hash channels (used by the dataset checksum, where a
    * single xor-folded channel could cancel; two bases make a joint
    * collision require simultaneous cancellation in both). Computed by
    * the native scalar [[graft.functions.PolyHash]] — one primitive
    * O(len) codegen loop; the previous `aggregate(split(text, ''), …)`
    * HOF paid a single-character UTF8String allocation per input
    * character on every fingerprint consumer (exact dedup, profiles,
    * snapshot diffs, host reputation). Values are identical
    * (ExpressionSpec pins native == SQL fold at both bases), so every
    * DuckDB oracle replaying the fold stays exact. */
  def fingerprintBase(text: Column, base: Int): Column =
    graft.functions.PolyHash.columnOf(text, base)

  /** THE two-channel row-content fingerprint: '|'-joined string casts of
    * `encodeCols` hashed at bases 31 and 37 (collision odds multiply
    * across independent channels). ONE definition shared by every
    * content-identity consumer — snapshot diff, content novelty, dataset
    * fingerprint, the streaming novelty monitor — because their
    * stream==batch / release==release exactness claims depend on
    * byte-identical encoding; a drifted copy would silently break parity.
    * Caveat carried from the sites: `concat_ws` SKIPS null columns, so
    * rows differing only by which column is null can collide — include
    * only columns whose string form is canonical (the [[graft.operators.Profile.profile]] rule). */
  def rowFingerprints(encodeCols: Seq[String]): (Column, Column) = {
    require(encodeCols.nonEmpty, "rowFingerprints needs encode columns")
    val e = concat_ws("|", encodeCols.map(c => col(c).cast("string")): _*)
    (fingerprintBase(e, 31), fingerprintBase(e, 37))
  }

  /** Winnowing-style fingerprint: minimum polynomial hash over k-char
    * windows — robust to local edits, used as a cheap near-dup prefilter.
    * Native O(len) rolling expression ([[graft.functions.MinWindowHash]]);
    * the hash family is the q25 [[fingerprint]] recurrence, so the result
    * is replayable window-by-window in a SQL oracle. */
  def minWindowHash(spark: org.apache.spark.sql.SparkSession,
                    text: Column, k: Int = 8): Column =
    graft.functions.MinWindowHash(spark, text, k)
}
