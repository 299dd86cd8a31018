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

  test("domainOf is evasion-proof: case folds, userinfo and port strip") {
    val rows = Seq(
      ("http://EVIL.com/x", Some("evil.com")),          // host case
      ("HTTP://evil.com/x", Some("evil.com")),          // scheme case
      ("http://foo@evil.com/", Some("evil.com")),       // userinfo
      ("http://a:b@evil.com/", Some("evil.com")),       // user:pass
      // double-@ authority confusion: WHATWG/curl resolve the host after
      // the LAST @ — a first-@ strip would emit the junk "b@evil.com"
      ("http://a@b@evil.com/", Some("evil.com")),
      ("http://a@b:c@EVIL.com:443/x", Some("evil.com")),
      ("http://EVIL.com:8080/x", Some("evil.com")),     // case + port
      ("http://user@", None),                           // empty host
      ("http://a@b@", None),                            // empty after last @
      // embedded tab/newline: WHATWG parsers strip ASCII tab and newline
      // BEFORE parsing, so these resolve host evil.com in any
      // browser/crawler — the screen must catch them, never NULL them
      ("http://a\nb@evil.com/", Some("evil.com")),
      ("htt\tp://EVIL.com\n/x", Some("evil.com")),
      // leading/trailing C0 controls and spaces: WHATWG trims them before
      // parsing (scraped-href padding is ubiquitous), so these also
      // resolve host evil.com and must be caught, never NULLed
      (" http://evil.com/x", Some("evil.com")),
      ("\u0001\thttp://EVIL.com/x \n", Some("evil.com")))
    val got = rows.map(_._1).toDF("url")
      .select(Urls.domainOf(col("url"))).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got == rows.map(_._2), got.toString)
    // and the blocklist actually catches the dressed-up forms
    val docs = rows.map(_._1).zipWithIndex
      .map { case (u, i) => (i.toLong, u) }.toDF("id", "url")
    val out = Urls.dropBlocklisted(docs, "url",
      Seq("evil.com").toDF("domain"))
    assert(out.select("id").as[Long].collect().toSet == Set(7L, 8L),
      "an evasion variant slipped the blocklist")
  }

  test("dropBlocklisted refuses an input already carrying 'domain'") {
    intercept[IllegalArgumentException] {
      Urls.dropBlocklisted(
        Seq((1L, "https://a.com/x", "pre")).toDF("id", "url", "domain"),
        "url", Seq("b.com").toDF("domain"))
    }
  }

  test("canonicalizeUrl normalizes each documented axis, one at a time") {
    val rows = Seq(
      // scheme+host case-folded, path case preserved
      ("HTTP://ExAmple.COM/Path/File", Some("http://example.com/Path/File")),
      // www. dropped
      ("https://www.example.com/a", Some("https://example.com/a")),
      // default port dropped, but only for its own scheme
      ("http://example.com:80/a", Some("http://example.com/a")),
      ("https://example.com:443/a", Some("https://example.com/a")),
      ("http://example.com:443/a", Some("http://example.com:443/a")),
      ("http://example.com:8080/a", Some("http://example.com:8080/a")),
      // fragment dropped
      ("http://example.com/a#sec2", Some("http://example.com/a")),
      // tracking params removed, other params and their ORDER preserved
      ("http://e.com/p?utm_source=x&b=2&gclid=g&a=1",
        Some("http://e.com/p?b=2&a=1")),
      // query emptied entirely loses its '?'
      ("http://e.com/p?utm_campaign=x&fbclid=y", Some("http://e.com/p")),
      // non-tracking param that merely CONTAINS a tracking name survives
      ("http://e.com/p?xutm_source=1&refx=2",
        Some("http://e.com/p?xutm_source=1&refx=2")),
      // bare host-root slash dropped; deeper trailing slashes kept
      ("http://example.com/", Some("http://example.com")),
      ("http://example.com/a/", Some("http://example.com/a/")),
      // junk / schemeless → NULL, never a canonical identity
      ("example.com/no-scheme", None),
      ("not a url", None),
      ("", None))
    val got = rows.map(_._1).toDF("url")
      .select(Urls.canonicalizeUrl(col("url"))).collect()
      .map(r => Option(r.getString(0))).toSeq
    assert(got == rows.map(_._2),
      got.zip(rows).filter { case (g, (_, e)) => g != e }.mkString("; "))
  }

  test("canonicalizeUrl merges the full decoration fan onto one identity") {
    val variants = Seq(
      "HTTP://WWW.Example.com:80/page?utm_source=a#top",
      "http://example.com/page",
      "http://www.example.com/page?fbclid=zzz",
      "http://Example.COM:80/page")
    val got = variants.toDF("url")
      .select(Urls.canonicalizeUrl(col("url"))).distinct().collect()
    assert(got.length == 1 && got.head.getString(0) == "http://example.com/page")
  }

  test("resolveRules: longest segment prefix wins, allow exceptions " +
    "inside deny subtrees, segment boundaries respected") {
    val urls = Seq(
      (1L, "https://h.com/p/2/d/9"),   // /p/2 allow beats /p deny
      (2L, "https://h.com/p/3/d/9"),   // /p deny
      (3L, "https://h.com/admin/t/1"), // /admin deny
      (4L, "https://h.com/pub/7"),     // only root matches
      (5L, "https://h.com"),           // bare host: path defaults to /
      (6L, "https://h.com/pq/1")       // '/p' must NOT match '/pq'
    ).toDF("id", "url")
    val rules = Seq(("/admin", 0L), ("/p", 0L), ("/p/2", 1L), ("/", 1L))
      .toDF("prefix", "allow")
    val got = Urls.resolveRules(urls, "id", "url", rules).collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2))))
      .toMap
    assert(got(1L) == ((Some("/p/2"), 1L)), got.toString)
    assert(got(2L) == ((Some("/p"), 0L)))
    assert(got(3L) == ((Some("/admin"), 0L)))
    assert(got(4L) == ((Some("/"), 1L)))
    assert(got(5L) == ((Some("/"), 1L)))
    assert(got(6L) == ((Some("/"), 1L)))
  }

  test("resolveRules: no matching rule defaults to allow with a NULL " +
    "prefix; rules broadcast (no cartesian)") {
    val urls = Seq((1L, "https://h.com/x")).toDF("id", "url")
    val rules = Seq(("/admin", 0L)).toDF("prefix", "allow")
    val out = Urls.resolveRules(urls, "id", "url", rules)
    val got = out.collect()
      .map(r => r.getLong(0) -> ((Option(r.getString(1)), r.getLong(2))))
      .toMap
    assert(got(1L) == ((None, 1L)), got.toString)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
