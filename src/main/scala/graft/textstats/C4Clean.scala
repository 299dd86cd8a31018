package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** C4-style line-level cleaning (Raffel et al. 2020 §2.2, the "Colossal
  * Clean Crawled Corpus" heuristics): a line survives only if it ends in a
  * terminal punctuation mark, carries at least `minWordsPerLine` words, and
  * contains none of an explicit lowercase blocklist phrase ("lorem ipsum"
  * filler, "javascript" error chrome, `{` code leakage); a document
  * survives only if at least `minKeptLines` of its lines do. The
  * per-LINE granularity is the point — boilerplate navigation chrome dies
  * while the prose around it survives, where the per-DOC Gopher battery
  * ([[GopherRules]]) must keep or kill whole documents.
  *
  * Complement to [[Boilerplate]] (row 98): that drops lines by CORPUS
  * frequency (needs a doc-frequency shuffle), this drops lines by local
  * FORM — zero shuffles, a pure function of the row, which also makes it
  * safe at ingest before any global statistics exist.
  *
  * Scale shape: split → in-row HOF `filter` → `array_join`, all inside
  * whole-stage codegen; the surviving-line count and rebuilt text come
  * from the same array, one scan, no exchanges anywhere.
  */
object C4Clean {

  /** Lowercase phrases whose presence kills a line (explicit so the DuckDB
    * oracle embeds them verbatim). */
  val blockPhrases: Seq[String] = Seq("lorem ipsum", "javascript", "{")

  /** Terminal-punctuation line test (C4: period / ! / ? / closing quote
    * after one of them), anchored at the trimmed end. */
  val terminalPattern: String = """[.!?]"?$"""

  /** Per-surviving-document: original line count, kept line count, and the
    * text rebuilt from kept lines in original order. Documents with fewer
    * than `minKeptLines` surviving lines are dropped (the C4 document
    * gate). */
  def cleanLines(docs: DataFrame, idCol: String, textCol: String,
                 minWordsPerLine: Int = 5,
                 minKeptLines: Int = 2): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => {
      // regexp, not trim(): trim strips only ASCII spaces, so a
      // tab-padded prose line wrongly fails the terminal-punctuation
      // gate and leading \t inflates the word count (the Boilerplate
      // normalization rule)
      val tl = regexp_replace(l, "^\\s+|\\s+$", "")
      val words = size(split(tl, TextFunctions.wsRun))
      val blocked = blockPhrases.map(p => lower(l).contains(p))
        .reduce(_ || _)
      tl.rlike(terminalPattern) && words >= minWordsPerLine && !blocked
    })
    docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, "\n").as("cleaned"))
      .filter(col("n_kept") >= minKeptLines)
  }

  /** De-hyphenation of line-wrapped words — the OCR/PDF cleanup pass
    * (print-era corpora wrap "information" as "informa-\ntion"; left in
    * place, the tokenizer mints two junk types per wrap and n-gram
    * dedup/quality stats all degrade): a letter, a hyphen, the line
    * break, a LOWERCASE continuation rejoin into one word; an uppercase
    * continuation stays — that's a real hyphenated compound across
    * lines ("state-\nOf-the-art" is not one word), the conservative
    * rule, documented. Per row: the join count and the rewritten text;
    * zero shuffles, one codegen regex count + one replace. */
  def dehyphenate(docs: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val pat = "([A-Za-z])-\n([a-z])"
    val t = coalesce(col(textCol), lit(""))
    docs.select(col(idCol),
      size(regexp_extract_all(t, lit(pat), lit(0))).cast("long")
        .as("n_joins"),
      regexp_replace(t, pat, "$1$2").as("cleaned"))
  }
}
