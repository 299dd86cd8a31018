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

  /** Authority part of a URL (group 1): everything between `scheme://`
    * and the first `/`, `?` or `#` — may still carry userinfo and a
    * port, which [[domainOf]] strips. Shared verbatim with the DuckDB
    * oracle. */
  val authorityRegex = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)"

  /** Host of a URL, BLOCKLIST-SAFE: scheme case-insensitive (RFC 3986),
    * userinfo stripped GREEDILY through the LAST `@` — WHATWG parsers and
    * curl resolve the host after the final `@`, so
    * `http://foo@evil.com/` and the double-`@` evasion
    * `http://a@b@evil.com/` must both extract `evil.com` (a first-`@`
    * strip would emit the junk domain `b@evil.com`, which misses every
    * blocklist row). Greedy `.*@` cannot overrun the authority: the
    * extract above already stopped at the first `/`, `?` or `#`. Port
    * stripped, and the host LOWERCASED (hosts are case-insensitive;
    * `EVIL.com` must hit the `evil.com` blocklist row). NULL when the
    * value doesn't parse as a URL — callers decide whether unparseable
    * means keep or drop; silently treating junk as a real domain would
    * let it through every blocklist. Every step is a plain
    * regexp_replace the oracle replays verbatim. */
  def domainOf(url: Column): Column = {
    // WHATWG URL parsing FIRST trims leading/trailing C0 controls and
    // spaces, THEN removes every ASCII tab and newline from the input —
    // so " http://evil.com/x" (scraped-href padding) and
    // "http://a\tb\n@evil.com/" both resolve host evil.com in any
    // browser/crawler, and the screen must apply the same two
    // normalizations or the padding/newline breaks the ^-anchored
    // authority match and the blocklisted domain walks through as a
    // NULL-domain row (review-pass findings)
    val trimmed = regexp_replace(url, "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")
    val clean = regexp_replace(trimmed, "[\\t\\n\\r]", "")
    val auth = regexp_extract(clean, authorityRegex, 1)
    val host = lower(regexp_replace(
      regexp_replace(auth, "^.*@", ""), ":[0-9]*$", ""))
    // contains-@ backstop: with tabs/newlines pre-stripped the greedy
    // `.*@` reaches the last @ in every parseable authority, so this
    // should never fire — it stays as the hard guarantee that no value
    // carrying '@' is ever emitted as a domain (the NULL contract)
    when(auth === "" || host === "" || host.contains("@"),
        lit(null).cast("string"))
      .otherwise(host)
  }

  /** Drop rows whose extracted domain is on the blocklist. The blocklist
    * frame (one `domain` string column) broadcasts; LEFT ANTI join keeps
    * the corpus side streaming through the scan. NULL domains (unparseable
    * URLs) survive the anti-join by SQL semantics — pair with an
    * `isNotNull` filter when junk URLs should also go. Emits the
    * extracted `domain` column; an input already carrying one is refused
    * (a silent duplicate would fail far downstream at analysis time). */
  def dropBlocklisted(df: DataFrame, urlCol: String,
                      blocklist: DataFrame): DataFrame = {
    require(!df.columns.contains("domain"),
      "dropBlocklisted emits a column named 'domain', which already " +
        "exists in the input — rename it first")
    val b = broadcast(blocklist.select(col("domain").as("__blocked")))
    df.withColumn("__domain", domainOf(col(urlCol)))
      .join(b, col("__domain") === col("__blocked"), "left_anti")
      .withColumnRenamed("__domain", "domain")
  }

  /** Scheme + authority prefix of a URL (everything through the host and
    * optional port); shared with the oracle. */
  val schemeHostRegex = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** Query parameters dropped by [[canonicalizeUrl]] — the cross-site
    * tracking decorations that make one page arrive under thousands of
    * distinct URLs in a crawl. */
  val trackingParamRegex = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|ref)="

  /** Canonical form of a URL — the normalization a crawl pipeline runs
    * BEFORE URL-level dedup, where it typically shrinks the frontier more
    * than any content hash (the same page arrives as http/HTTPS, with and
    * without www, with a fragment, and under a fan of utm_* click
    * decorations):
    *
    *   1. fragment dropped (`#...` is client-side only);
    *   2. scheme + host lowercased (path/query case PRESERVED — paths are
    *      case-sensitive by RFC 3986);
    *   3. `www.` host prefix dropped;
    *   4. default ports dropped (`:80` for http, `:443` for https — only
    *      for their own scheme);
    *   5. tracking parameters removed ([[trackingParamRegex]]), remaining
    *      parameter ORDER preserved (reordering would merge
    *      `?a=1&b=2`-vs-`?b=2&a=1` but also break signed URLs — the
    *      conservative choice); a now-empty query loses its `?`;
    *   6. a bare host-root trailing slash dropped
    *      (`http://a.com/` ≡ `http://a.com`).
    *
    * NULL for values with no `scheme://` authority (the [[domainOf]]
    * contract: junk must not impersonate a canonical identity). Pure
    * per-row regexp/string ops, zero shuffles, RE2-compatible and free of
    * group-replacement syntax (Java `$1` vs RE2 `\1` differ), so a DuckDB
    * oracle replays it byte-for-byte. */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val prefixRaw = regexp_extract(noFrag, schemeHostRegex, 0)
    val rest = regexp_replace(noFrag, schemeHostRegex, "")
    val p1 = regexp_replace(lower(prefixRaw), "://www\\.", "://")
    val p2 = when(p1.startsWith("http://"), regexp_replace(p1, ":80$", ""))
      .when(p1.startsWith("https://"), regexp_replace(p1, ":443$", ""))
      .otherwise(p1)
    val path = regexp_replace(rest, "\\?.*", "")
    val query = regexp_extract(rest, "\\?(.*)", 1)
    val kept = filter(split(query, "&"),
      t => !t.rlike(trackingParamRegex))
    val joined = array_join(kept, "&")
    val canon = concat(p2, path,
      when(joined === "", lit("")).otherwise(concat(lit("?"), joined)))
    val deslashed = when(canon.rlike("^[a-z][a-z0-9+.-]*://[^/?#]+/$"),
      canon.substr(lit(1), length(canon) - 1)).otherwise(canon)
    when(prefixRaw === "", lit(null).cast("string")).otherwise(deslashed)
  }

  /** Robots-style longest-prefix rule resolution — the crawl-compliance
    * precedence read (RFC 9309 / Google's robots semantics): among the
    * rules whose path prefix matches a URL, the LONGEST prefix decides;
    * at equal length allow beats disallow; no match defaults to allow.
    * The row-97 blocklist kills whole domains — this is the path-level
    * complement (opt-out subtrees, allow-listed exceptions inside a
    * disallowed directory).
    *
    * Declared restriction that buys the distributed shape: rule prefixes
    * are SEGMENT-form — `/`, or `/seg[/seg...]` with no trailing slash —
    * and match at directory boundaries (`/p` matches `/p` and `/p/...`,
    * never `/pq`). A URL's candidate keys are then its ≤ depth+1 segment
    * prefixes, so matching is an EXPLODE + broadcast equi-join on the
    * prefix — never a `startswith` theta-join over the rule table. All
    * matching candidates have distinct lengths by construction (depth i's
    * prefix is strictly longer than depth i−1's), so the max pick is
    * unambiguous for a duplicate-free ruleset; the (length, allow) struct
    * order still breaks a malformed duplicate-prefix tie toward allow,
    * the RFC's rule.
    *
    * Scale: rules broadcast (robots rulesets are tiny next to a crawl);
    * one groupBy on the URL id over matched candidates (≤ depth+1 rows
    * per URL) and one keyed join back — nothing corpus-sized shuffles
    * beyond the id. */
  def resolveRules(urls: DataFrame, idCol: String, urlCol: String,
                   rules: DataFrame): DataFrame = {
    val rawPath = regexp_extract(col(urlCol),
      "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val segs = "filter(split(__path, '/'), x -> x != '')"
    val cands = urls
      .withColumn("__path",
        when(rawPath === "" || rawPath.isNull, lit("/")).otherwise(rawPath))
      .withColumn("__cand", explode(concat(array(lit("/")),
        expr(s"CASE WHEN size($segs) = 0 THEN array() " +
          s"ELSE transform(sequence(1, size($segs)), " +
          s"i -> concat('/', array_join(slice($segs, 1, i), '/'))) END"))))
    val matched = cands
      .join(broadcast(rules.select(col("prefix"),
        col("allow").cast("long").as("__allow"))),
        col("__cand") === col("prefix"))
      .groupBy(col(idCol))
      .agg(max(struct(length(col("prefix")).as("l"),
        col("__allow").as("a"), col("prefix").as("p"))).as("__best"))
      .select(col(idCol), col("__best.p").as("matched_prefix"),
        col("__best.a").as("allowed"))
    urls.select(col(idCol))
      .join(matched, Seq(idCol), "left")
      .select(col(idCol), col("matched_prefix"),
        coalesce(col("allowed"), lit(1L)).as("allowed"))
  }
}
