package graft

import org.apache.spark.sql.functions._

import graft.textstats.Pii

class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) =
    Seq(text).toDF("t").select(
      Pii.emailCount(col("t")).as("e"), Pii.ssnCount(col("t")).as("s"),
      Pii.phoneCount(col("t")).as("p"), Pii.ipv4Count(col("t")).as("i"),
      Pii.redact(col("t")).as("r")).head()

  test("each category detected and redacted") {
    val r = one("mail a.b+c@test.org ssn 123-45-6789 " +
      "call 555-123-4567 host 192.168.0.1 done")
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == (1, 1, 1, 1))
    assert(r.getString(4) ==
      "mail <EMAIL> ssn <SSN> call <PHONE> host <IP> done")
  }

  test("patterns are disjoint: phone is not an SSN, IP is not a phone") {
    val r = one("555-123-4567 and 123-45-6789 and 10.0.3.1")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 1)
    assert(r.getInt(0) == 0)
  }

  test("clean text unchanged, zero counts") {
    val r = one("no personal data here at all")
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == (0, 0, 0, 0))
    assert(r.getString(4) == "no personal data here at all")
  }

  test("multiple hits of one category all redacted") {
    val r = one("a@b.co x c@d.net")
    assert(r.getInt(0) == 2)
    assert(r.getString(4) == "<EMAIL> x <EMAIL>")
  }

  test("overlapping span counts once: phone glued to @domain is one email") {
    val r = one("reach 555-123-4567@mail.com ok")
    // sequential counting: the phone digits are inside the (already
    // redacted) email span, so they are NOT also a phone hit
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == (1, 0, 0, 0))
    assert(r.getString(4) == "reach <EMAIL> ok")
  }

  test("digit runs that are not PII survive") {
    val r = one("version 1.2 build 20240101 pi 3.14159")
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == (0, 0, 0, 0))
  }
}
