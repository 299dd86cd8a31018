package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain handling for curation blocklists: extract the host from a URL
  * column with one native regexp (codegen, no UDF), and drop rows whose
  * domain appears on a blocklist via a broadcast anti-join — the standard
  * web-corpus domain screen (spam/adult/SEO lists run to ~10⁶ entries,
  * comfortably broadcastable; the corpus side stays shuffle-free).
  */
object Urls {

  /** Host part of a URL: the authority between `scheme://` and the first
    * `/`, `:`, `?` or `#`. NULL when the value doesn't parse as a URL —
    * callers decide whether unparseable means keep or drop; silently
    * treating junk as a real domain would let it through every blocklist.
    * The regexp is shared verbatim with the DuckDB oracle. */
  val domainRegex = "^[a-z][a-z0-9+.-]*://([^/:?#]+)"

  def domainOf(url: Column): Column = {
    val m = regexp_extract(url, domainRegex, 1)
    when(m === "", lit(null).cast("string")).otherwise(m)
  }

  /** Drop rows whose extracted domain is on the blocklist. The blocklist
    * frame (one `domain` string column) broadcasts; LEFT ANTI join keeps
    * the corpus side streaming through the scan. NULL domains (unparseable
    * URLs) survive the anti-join by SQL semantics — pair with an
    * `isNotNull` filter when junk URLs should also go. */
  def dropBlocklisted(df: DataFrame, urlCol: String,
                      blocklist: DataFrame): DataFrame = {
    val b = broadcast(blocklist.select(col("domain").as("__blocked")))
    df.withColumn("__domain", domainOf(col(urlCol)))
      .join(b, col("__domain") === col("__blocked"), "left_anti")
      .withColumnRenamed("__domain", "domain")
  }
}
