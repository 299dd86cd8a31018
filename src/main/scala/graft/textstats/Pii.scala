package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
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
  * contain digit runs — even a whole phone/SSN glued to `@domain` — that
  * the later numeric patterns would otherwise also claim), then SSN
  * (3-2-4 digit shape), then phone (3-3-4 — disjoint from SSN because the
  * `\b`-anchored group widths differ), then IPv4 (needs three dots, which
  * no phone/SSN leaves behind). Counts are measured SEQUENTIALLY on the
  * same progressively-redacted text the redaction pipeline sees (n_ssn
  * counts the email-redacted text, and so on), so `piiCount` equals the
  * number of placeholders redact() emits by construction — a span like
  * `555-123-4567@mail.com` is one email, not an email plus a phone.
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

  /** The progressive redaction stages, in the documented order. */
  private def afterEmail(text: Column): Column =
    regexp_replace(text, emailPattern, "<EMAIL>")
  private def afterSsn(text: Column): Column =
    regexp_replace(afterEmail(text), ssnPattern, "<SSN>")
  private def afterPhone(text: Column): Column =
    regexp_replace(afterSsn(text), phonePattern, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(emailPattern))
  def ssnCount(text: Column): Column =
    regexp_count(afterEmail(text), lit(ssnPattern))
  def phoneCount(text: Column): Column =
    regexp_count(afterSsn(text), lit(phonePattern))
  def ipv4Count(text: Column): Column =
    regexp_count(afterPhone(text), lit(ipv4Pattern))

  /** Total PII spans = total placeholders redact() emits (sequential
    * counting makes this exact even when categories overlap textually). */
  def piiCount(text: Column): Column =
    emailCount(text) + ssnCount(text) + phoneCount(text) + ipv4Count(text)

  /** Replace every PII span with a category placeholder, in the documented
    * order. `regexp_replace` is global in Spark (the oracle passes 'g'). */
  def redact(text: Column): Column =
    regexp_replace(afterPhone(text), ipv4Pattern, "<IP>")

  /** All counts + the redacted text in one pass, with each redaction stage
    * STAGED as a column (n_email/n_ssn/n_phone/n_ip/redacted appended).
    * The single-column helpers above each rebuild the progressive chain,
    * which in a many-column projection leans on codegen subexpression
    * elimination to avoid re-running full-text regexes; staging guarantees
    * one evaluation per stage per row — the exact shape of the oracle's
    * r1/r2/r3 CTEs. Use this form for whole-corpus scans. */
  def withPiiStats(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("__t1",
        regexp_replace(col(textCol), emailPattern, "<EMAIL>"))
      .withColumn("__t2", regexp_replace(col("__t1"), ssnPattern, "<SSN>"))
      .withColumn("__t3", regexp_replace(col("__t2"), phonePattern, "<PHONE>"))
      .withColumn("n_email",
        regexp_count(col(textCol), lit(emailPattern)).cast("long"))
      .withColumn("n_ssn", regexp_count(col("__t1"), lit(ssnPattern)).cast("long"))
      .withColumn("n_phone",
        regexp_count(col("__t2"), lit(phonePattern)).cast("long"))
      .withColumn("n_ip", regexp_count(col("__t3"), lit(ipv4Pattern)).cast("long"))
      .withColumn("redacted", regexp_replace(col("__t3"), ipv4Pattern, "<IP>"))
      .drop("__t1", "__t2", "__t3")
}
