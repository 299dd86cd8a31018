package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log-template mining, Drain-style first pass: mask the variable parts
  * (digit runs → `#`), squeeze the residue, and count the surviving
  * TEMPLATES — the triage step for machine-generated text in a crawl
  * (stack traces, access logs, telemetry dumps all collapse to a handful
  * of templates with huge counts, while prose stays near-unique) and the
  * log-analytics staple for "what is this service actually emitting".
  *
  * The mask is ONE regexp_replace per row (codegen, zero shuffles); the
  * count is a map-side-combined groupBy bounded by distinct templates;
  * the top-k is TakeOrdered on the (n desc, template asc) total order —
  * never a full sort shuffle. Exact integers end-to-end.
  */
object Templates {

  /** The masked form of one text: digit runs → `#`, whitespace squeezed,
    * trimmed. */
  def template(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(regexp_replace(c, "[0-9]+", "#"),
      graft.functions.TextFunctions.wsRun, " "))

  /** Top-k templates by document count, cut on the (n desc, template asc)
    * total order — the order IS the rank, so no rank column (a global
    * row_number window would force a full sort where TakeOrdered needs
    * only a per-partition heap). */
  def topTemplates(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val counts = docs
      .filter(col(textCol).isNotNull)
      .select(template(col(textCol)).as("template"))
      .groupBy("template").agg(count(lit(1)).as("n"))
    counts.orderBy(col("n").desc, col("template").asc).limit(k)
  }
}
