package graft.textstats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data pipelines.
  *
  * Four detector classes — email, SSN, US-style phone, IPv4 — each a plain
  * ASCII regex valid in BOTH Java regex (Spark) and RE2 (the DuckDB oracle),
  * applied via native `regexp_count` / `regexp_replace`: per-row codegen'd
  * work, no UDFs, no shuffles, so redaction composes under any scan and runs
  * at full width on a 100 TB corpus.
  *
  * Redaction order matters and is fixed: email first (its local part may
  * contain digit runs that the later numeric patterns would otherwise chew
  * up), then SSN (3-2-4 digit shape), then phone (3-3-4 — disjoint from SSN
  * because the `\b`-anchored group widths differ), then IPv4 (needs three
  * dots, which no phone/SSN leaves behind). Counts are measured on the
  * ORIGINAL text per category, which is exact precisely because the four
  * patterns cannot overlap on the same span.
  */
object Pii {

  /** RFC-ish practical email: local part, @, dotted domain, ≥2-letter TLD. */
  val emailPattern: String =
    """[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"""

  /** US Social Security number, 3-2-4 digits, dash-separated. */
  val ssnPattern: String = """\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"""

  /** US-style phone, 3-3-4 digits with dash or dot separators. */
  val phonePattern: String = """\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"""

  /** Dotted-quad IPv4 (shape only; octet range not validated — a range
    * check would need alternation that hurts both readability and the
    * cross-engine guarantee, and over-redaction is the safe failure mode
    * for PII). */
  val ipv4Pattern: String =
    """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def ssnCount(text: Column): Column = regexp_count(text, lit(ssnPattern))
  def phoneCount(text: Column): Column = regexp_count(text, lit(phonePattern))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(ipv4Pattern))

  /** Total PII hits across all categories (exact — patterns are disjoint). */
  def piiCount(text: Column): Column =
    emailCount(text) + ssnCount(text) + phoneCount(text) + ipv4Count(text)

  /** Replace every PII span with a category placeholder, in the documented
    * order. `regexp_replace` is global in Spark (the oracle passes 'g'). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, emailPattern, "<EMAIL>"),
          ssnPattern, "<SSN>"),
        phonePattern, "<PHONE>"),
      ipv4Pattern, "<IP>")
}
