package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** HTML/markup → text extraction — the step a web-crawl training-data
  * pipeline runs before ANY of the text operators in this library see a
  * byte (the reference corpus is pre-extracted Yelp text; real corpora
  * arrive as markup): script/style/comment payloads dropped, tags
  * stripped, the core character entities decoded, whitespace squeezed —
  * plus outlink (`href`) extraction, the feed for the URL-frontier /
  * blocklist side ([[Urls]]) of the crawl loop.
  *
  * Everything here is per-row codegen'd regexp/replace over the markup
  * column — zero shuffles, embarrassingly parallel, the 100 TB cost is
  * exactly one pass over the payload bytes. Patterns are deliberately
  * RE2-compatible (no backreferences — script and style close-tags are
  * separate passes — and no lookaround), so a DuckDB oracle replays the
  * extraction byte-for-byte and the same patterns would run on any
  * RE2-based engine.
  *
  * This is the pragmatic tag-stripper, not a browser: unclosed `<` with
  * no matching `>` is left as text (never silently swallowed to
  * end-of-document), attributes are dropped with their tags, and only
  * the six core entities are decoded (`&nbsp; &quot; &#39; &lt; &gt;
  * &amp;` — `&amp;` LAST, the standard order that makes `&amp;lt;`
  * decode to the literal text `&lt;`, not to `<`). CDATA and exotic
  * numeric entities pass through as text; a full HTML5 tokenizer is a
  * per-partition codec job (the [[graft.multimodal]] pattern), not a
  * regex. */
object Markup {

  /** `<script ...> ... </script>` including payload — case-insensitive,
    * dot-matches-newline, non-greedy so adjacent blocks don't merge. */
  val scriptBlockRe = "(?is)<script[^>]*>.*?</script>"

  /** `<style ...> ... </style>` including payload. */
  val styleBlockRe = "(?is)<style[^>]*>.*?</style>"

  /** `<!-- ... -->` comments (dot-matches-newline, non-greedy). */
  val commentRe = "(?s)<!--.*?-->"

  /** Any remaining tag: `<` through the next `>`. An unclosed `<` does
    * not match and stays in the text — loud, not silent. */
  val tagRe = "(?s)<[^>]*>"

  /** `href=` value capture (group 1), case-insensitive — double-quoted,
    * single-quoted, or unquoted (all three are routine in real HTML; a
    * double-quote-only pattern silently loses every outlink from
    * single-quoting sites). Quoted captures INCLUDE their quotes — one
    * capturing group keeps `regexp_extract_all` usable — and
    * [[extractLinks]] strips them after extraction. */
  val hrefRe = "(?i)href=(\"[^\"]*\"|'[^']*'|[^\\s>\"']+)"

  /** Unterminated `<script`/`<style` openers (a truncated crawl record):
    * applied AFTER the paired-block and comment passes, so any opener
    * still present has no close tag — its payload would otherwise leak
    * into the text column as visible "prose". Swallowing to end-of-input
    * is exactly browser error recovery, and RE2-safe. */
  val openScriptTailRe = "(?is)<script[^>]*>.*$"
  val openStyleTailRe = "(?is)<style[^>]*>.*$"

  /** Entity → character, applied in order; `&amp;` must stay last. */
  val entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
    "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")

  /** Markup with script/style/comment payloads dropped (replaced by a
    * space so `a<script>..</script>b` cannot weld into `ab`). */
  private def stripBlocks(c: Column): Column = {
    val paired = regexp_replace(regexp_replace(regexp_replace(c,
      scriptBlockRe, " "), styleBlockRe, " "), commentRe, " ")
    // unterminated-opener fallback LAST: paired blocks and comments are
    // already gone (a commented-out opener must not swallow the document)
    regexp_replace(regexp_replace(paired,
      openScriptTailRe, " "), openStyleTailRe, " ")
  }

  /** Visible text of a markup column: blocks → tags → entities →
    * whitespace squeeze → trim. */
  def extractText(c: Column): Column = {
    val noTags = regexp_replace(stripBlocks(c), tagRe, " ")
    val decoded = entities.foldLeft(noTags) { case (acc, (ent, ch)) =>
      call_function("replace", acc, lit(ent), lit(ch))
    }
    trim(TextFunctions.squeezeWs(decoded))
  }

  /** All `href` targets in document order (script/style/comment payloads
    * excluded first — a URL inside a commented-out link is not an
    * outlink). */
  def extractLinks(c: Column): Column =
    transform(regexp_extract_all(stripBlocks(c), lit(hrefRe), lit(1)),
      x => regexp_replace(x, "^[\"']|[\"']$", ""))

  /** (id, text, links, n_links) extraction frame over a markup column —
    * the whole-corpus ingest transform. */
  def extract(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
      extractText(col(htmlCol)).as("text"),
      extractLinks(col(htmlCol)).as("links"))
      .withColumn("n_links", size(col("links")).cast("long"))
}
