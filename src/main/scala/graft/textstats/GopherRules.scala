package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Gopher-style document quality rule bundle (Rae et al. 2021, appendix A
  * "quality filtering" heuristics, re-parameterized for this corpus): the
  * standard pre-filter battery run over a raw crawl BEFORE any model-based
  * scoring — word-count bounds, mean-word-length band, symbol-to-char
  * ceiling, alphabetic-word floor, stopword-evidence floor. Unlike the
  * single composite [[TextStats.qualityScore]], every rule reports its own
  * verdict so curation can tune one threshold without re-deriving the rest.
  *
  * Exactness: every metric is integer (deci-chars / basis points / counts)
  * with one integer `div` each — no doubles anywhere, so rows hash-match
  * the DuckDB replay bit-for-bit.
  *
  * Scale shape: pure per-row codegen expressions over one scan — zero
  * shuffles, embarrassingly parallel, composes under any filter pushdown.
  * The 100 TB cost is the scan itself.
  */
object GopherRules {

  /** Per-document metrics + per-rule verdicts + the composite keep flag.
    *
    * Metrics (trimmed text, `\s+` tokenization as q23/q24):
    *  - `n_words`     whitespace token count
    *  - `mwl_deci`    mean word length in deci-chars: (10·non-ws chars) div words
    *  - `symbol_bp`   punct/digit/control chars per 10⁴ chars
    *  - `alpha_bp`    tokens containing a letter per 10⁴ tokens
    *  - `stop_hits`   tokens in the explicit [[TextStats.stopwordCore]] list
    *
    * Rules: words ∈ [minWords, maxWords]; mwl_deci ∈ [mwlLoDeci, mwlHiDeci];
    * symbol_bp ≤ maxSymbolBp; alpha_bp ≥ minAlphaBp; stop_hits ≥ minStopHits.
    * `keep` = all five. Empty text: split('') yields one empty token, so
    * n_words ≥ 1 and every division stays defined (documented, mirrored by
    * the oracle).
    */
  def audit(docs: DataFrame, idCol: String, textCol: String,
            minWords: Int = 40, maxWords: Int = 5000,
            mwlLoDeci: Int = 30, mwlHiDeci: Int = 80,
            maxSymbolBp: Int = 1000, minAlphaBp: Int = 8000,
            minStopHits: Int = 2): DataFrame = {
    val t = trim(col(textCol))
    val toks = split(t, TextFunctions.wsRun)
    val lowToks = split(lower(t), TextFunctions.wsRun)

    docs.select(
      col(idCol),
      size(toks).cast("long").as("n_words"),
      length(regexp_replace(t, TextFunctions.wsRun, "")).cast("long")
        .as("__wchars"),
      length(col(textCol)).cast("long").as("__nchars"),
      (length(col(textCol)) - length(regexp_replace(col(textCol),
        TextFunctions.punctDigitsClass, ""))).cast("long").as("__symbols"),
      size(filter(toks, tk => tk.rlike("[a-zA-Z]"))).cast("long")
        .as("__alpha"),
      size(filter(lowToks, tk => tk.isin(TextStats.stopwordCore: _*)))
        .cast("long").as("stop_hits"))
      .withColumn("mwl_deci", expr("(10 * __wchars) div n_words"))
      .withColumn("symbol_bp", when(col("__nchars") === 0, lit(0L))
        .otherwise(expr("(10000 * __symbols) div __nchars")))
      .withColumn("alpha_bp", expr("(10000 * __alpha) div n_words"))
      .withColumn("r_words",
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .cast("long"))
      .withColumn("r_mwl",
        (col("mwl_deci") >= mwlLoDeci && col("mwl_deci") <= mwlHiDeci)
          .cast("long"))
      .withColumn("r_symbol", (col("symbol_bp") <= maxSymbolBp).cast("long"))
      .withColumn("r_alpha", (col("alpha_bp") >= minAlphaBp).cast("long"))
      .withColumn("r_stop", (col("stop_hits") >= minStopHits).cast("long"))
      .withColumn("keep",
        col("r_words") * col("r_mwl") * col("r_symbol") *
          col("r_alpha") * col("r_stop"))
      .drop("__wchars", "__nchars", "__symbols", "__alpha")
  }
}
