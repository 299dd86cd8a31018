package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Code-likeness detection — the prose/code routing signal every mixed
  * crawl needs before mixture weighting (code wants different dedup
  * granularity, different quality rules, and its own mixture slice; the
  * StarCoder/CodeParrot pipelines run exactly this triage first). Two
  * deterministic per-row signals, both engine-replayable:
  *
  *  - `sym_chars`: count of code-syntax characters ({ } ( ) [ ] ; = < >)
  *    via the delete-and-diff idiom (length after deleting everything
  *    else) — prose is near-free of them, source text is dense in them;
  *  - `kw_hits`: occurrence counts (with multiplicity) of a fixed
  *    keyword-fragment list via replace-and-diff division — fragments
  *    chosen with trailing context (`"return "`, `"import "`) so prose
  *    collisions stay rare.
  *
  * Fused into `code_score_bp` = min(10000, 10000·(sym + 10·kw) / chars)
  * in pure integer arithmetic, flagged at a caller threshold. Zero
  * shuffles — every signal is one codegen'd row expression; at 100 TB
  * this runs at scan speed next to the row-37/147 quality signals and
  * feeds the same rank-ensemble/mixture machinery.
  */
object CodeDetect {

  /** The keyword fragments counted by [[codeScore]] — shared with the
    * oracle so both engines count the same strings. */
  val keywords: Seq[String] =
    Seq("return ", "import ", "def ", "void ", "function ", "();")

  /** (id, chars, sym_chars, kw_hits, code_score_bp, is_code) per doc;
    * null/empty text scores 0 and is never flagged. */
  def codeScore(df: DataFrame, idCol: String, textCol: String,
                thresholdBp: Int = 300): DataFrame = {
    require(keywords.forall(k => !k.contains("'") && !k.contains("\\")),
      "keyword fragments are interpolated into SQL literals")
    // integer div throughout (the replace-and-diff count is an exact
    // multiple of the fragment length, but the repo's discipline is to
    // never route an exact count through a double)
    val kwSql = keywords
      .map(k => s"((length(__t) - length(replace(__t, '$k', ''))) " +
        s"div ${k.length})")
      .mkString(" + ")
    df.withColumn("__t", coalesce(col(textCol), lit("")))
      .select(
        col(idCol),
        length(col("__t")).cast("long").as("chars"),
        length(regexp_replace(col("__t"), "[^{}()\\[\\];=<>]", ""))
          .cast("long").as("sym_chars"),
        expr(s"cast($kwSql as bigint)").as("kw_hits"))
      .withColumn("code_score_bp",
        least(lit(10000L), expr(
          "(10000 * (sym_chars + 10 * kw_hits)) div greatest(chars, 1)")))
      .withColumn("is_code",
        (col("code_score_bp") >= thresholdBp).cast("long"))
  }
}
