package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script-mix profile — the writing-system census a multilingual
  * corpus needs before language-ID is even meaningful ([[TextStats.langId]]
  * is a Latin-alphabet stopword heuristic; routing Cyrillic or CJK text
  * into it is garbage-in), and the mixed-script screen that catches
  * mojibake (double-decoded bytes land in extended ranges), copy-paste
  * corruption, and homoglyph spoofing (Latin text salted with Cyrillic
  * look-alikes — the filter-evasion trick [[graft.functions.NormalizeText]]
  * cannot fold because confusables are DIFFERENT letters, not
  * compatibility forms).
  *
  * Per document: code-point counts for six major script ranges, the
  * dominant script (first-in-class-order tie-break — deterministic), the
  * number of scripts holding ≥ `minShareBp` of the document's script
  * characters, and a mixed-script flag. Counts are
  * `length(text) − length(regexp_replace(text, class, ''))` — per-row
  * codegen'd, zero shuffles, one pass per class over the string. Classes
  * are explicit BMP code-point ranges (never `\p{Script=...}` property
  * names, whose tables differ between Java regex and RE2 versions), so a
  * DuckDB oracle counts the identical characters and `length()` agrees
  * (both engines count code points; every range is inside the BMP). */
object Scripts {

  /** (name, regex class) in dominance-preference order. Ranges are the
    * core blocks only (Basic Latin letters + Latin-1/Extended-A/B,
    * Cyrillic, Greek, Arabic, Hiragana/Katakana + CJK Unified, Hangul
    * syllables) — the point is a robust census, not Unicode completeness;
    * supplementary-plane additions would need code-point-aware length on
    * both engines. */
  val classes: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "greek" -> "[\\x{0370}-\\x{03FF}]",
    "arabic" -> "[\\x{0600}-\\x{06FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]",
    "hangul" -> "[\\x{AC00}-\\x{D7A3}]")

  /** Count of code points of `c` matching `cls` (delete-and-diff: both
    * engines lack a shared regexp_count). */
  private def cnt(c: Column, cls: String): Column =
    (length(c) - length(regexp_replace(c, cls, ""))).cast("long")

  /** Per-doc script census: (id, n_<script>..., n_script_chars,
    * dom_script, n_scripts, mixed). `mixed` is 1 iff ≥ 2 scripts each
    * hold ≥ `minShareBp` basis points of the script characters — the
    * homoglyph/mojibake flag (500 bp default: a lone loanword doesn't
    * trip it, a salted document does). */
  def profile(df: DataFrame, idCol: String, textCol: String,
              minShareBp: Int = 500): DataFrame = {
    require(minShareBp >= 1 && minShareBp <= 10000,
      s"minShareBp must be in [1, 10000], got $minShareBp")
    val t = col(textCol)
    val counted = df.select(
      (col(idCol) +: classes.map { case (n, cls) => cnt(t, cls).as(s"n_$n") })
        : _*)
    val total = classes.map(c => col(s"n_${c._1}")).reduce(_ + _)
    val withTot = counted.withColumn("n_script_chars", total)
    val m = greatest(classes.map(c => col(s"n_${c._1}")): _*)
    val dom = when(col("n_script_chars") === 0, lit("none")).otherwise(
      classes.foldRight(lit("none"): Column) { case ((n, _), acc) =>
        when(col(s"n_$n") === m, lit(n)).otherwise(acc)
      })
    // share test as cnt·10⁴ ≥ bp·total — all-integer, no division
    val nScripts = classes.map { case (n, _) =>
      when(col(s"n_$n") > 0 &&
        col(s"n_$n") * 10000L >= lit(minShareBp.toLong) *
          col("n_script_chars"), 1L).otherwise(0L)
    }.reduce(_ + _)
    withTot
      .withColumn("dom_script", dom)
      .withColumn("n_scripts", nScripts)
      .withColumn("mixed", (col("n_scripts") >= 2).cast("long"))
  }
}
