package graft

import org.apache.spark.sql.functions._

import graft.textstats.Urls

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  test("domainOf extracts the host; junk and schemeless values are NULL") {
    val rows = Seq(
      ("https://spam.example.com/path?q=1", Some("spam.example.com")),
      ("http://a.b.co:8080/x", Some("a.b.co")),           // port excluded
      ("ftp://files.example.org", Some("files.example.org")),
      ("www.example.com/no-scheme", None),                // schemeless
      ("not a url at all", None),
      ("", None))
    val got = rows.map(_._1).toDF("url")
      .select(Urls.domainOf(col("url"))).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got == rows.map(_._2))
  }

  test("dropBlocklisted removes exactly the listed domains, broadcast anti") {
    val docs = Seq(
      (1L, "https://keep.example.com/a"),
      (2L, "https://spam.example.com/b"),
      (3L, "https://also-keep.org/c"),
      (4L, "junk"),                       // unparseable: survives by contract
      (5L, "https://spam.example.com/d")).toDF("id", "url")
    val block = Seq("spam.example.com", "unused.example.net").toDF("domain")
    val out = Urls.dropBlocklisted(docs, "url", block)
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 3L, 4L))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"blocklist not a broadcast anti-join:\n$plan")
    // the extracted domain rides the output for downstream per-domain stats
    assert(out.columns.contains("domain"))
  }
}
