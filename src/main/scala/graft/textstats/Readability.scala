package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Readability scoring — the Flesch reading-ease signal in exact integer
  * milli-units, the curation knob between "too simple to teach anything"
  * and "OCR garbage nobody can read" that sits beside the row-37 quality
  * heuristics in every published filtering bundle. All three inputs are
  * deterministic regex counts both engines share:
  *
  *  - words: whitespace tokens (the row-38 rule);
  *  - sentences: runs of terminal punctuation `[.!?]+`, floored at 1 (a
  *    fragment without a terminator is one sentence, not zero);
  *  - syllables: the standard vowel-GROUP proxy — runs of
  *    `[aeiouyAEIOUY]+` — the textstat-style approximation, documented
  *    as a proxy (true syllabification is dictionary work).
  *
  * flesch_m = 206835 − (1015·words) div sentences − (84600·syll) div
  * words — each division truncates non-negative integers, so the score
  * is bit-identical on any engine; real texts land ~0–100000, garbage
  * goes deeply negative (long unpunctuated runs), and that asymmetry is
  * the filter signal. Word counting follows the row-38 whitespace-split
  * convention where split("") = [""] — empty/null text therefore counts
  * as ONE word (and one floored sentence, zero syllables), scoring the
  * constant 206835 − 1015 − 0 = 205820; flesch_m is total (never NULL),
  * and ReadabilitySpec pins the empty-doc constant. Zero shuffles —
  * three codegen regex counts per row.
  */
object Readability {

  /** (id, words, sentences, syllables, flesch_m) per doc. */
  def flesch(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    df.select(
        col(idCol),
        TextStats.wsTokenCount(t).cast("long").as("words"),
        greatest(size(regexp_extract_all(t, lit("[.!?]+"), lit(0)))
          .cast("long"), lit(1L)).as("sentences"),
        size(regexp_extract_all(t, lit("[aeiouyAEIOUY]+"), lit(0)))
          .cast("long").as("syllables"))
      .withColumn("flesch_m", expr(
        // words >= 1 always (split("") = [""], class doc) — the
        // divisions are well-defined with no NULL branch
        "206835 - (1015 * words) div sentences - " +
          "(84600 * syllables) div words"))
  }
}
