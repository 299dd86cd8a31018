package graft

import org.apache.spark.sql.functions._

import graft.textstats.Markup

class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def text(html: String): String =
    Seq(Tuple1(html)).toDF("h").select(Markup.extractText(col("h")))
      .head().getString(0)

  private def links(html: String): Seq[String] =
    Seq(Tuple1(html)).toDF("h").select(Markup.extractLinks(col("h")))
      .head().getSeq[String](0)

  test("script and style payloads are dropped, not just their tags") {
    assert(text("<script a=1>var x = '<p>not text</p>';</script>ok" +
      "<style>p { color: red }</style>") == "ok")
    // multi-line payload, case-insensitive close tag
    assert(text("a<SCRIPT>\nvar i=1;\n</script>b") == "a b")
  }

  test("comments are dropped including markup inside them") {
    assert(text("a<!-- <b>hidden</b> \n more -->b") == "a b")
  }

  test("tags strip to spaces; text is squeezed and trimmed") {
    assert(text("<p>one <b>two</b>&nbsp;three</p>") == "one two three")
  }

  test("core entities decode; &amp; decodes last so &amp;lt; stays literal") {
    assert(text("A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39;") ==
      "A & B <tag> \"q\" 's'")
    assert(text("x &amp;lt; y") == "x &lt; y")
  }

  test("an unclosed < with no later > stays as text (loud, not swallowed)") {
    assert(text("threshold 5 < 6") == "threshold 5 < 6")
    // the documented regex-stripper tradeoff: a later > closes it
    assert(text("5 < 6 and 7 > 4") == "5 4")
  }

  test("hrefs extract in document order; commented-out links excluded") {
    val h = """<!-- <a href="http://no.com">x</a> -->""" +
      """<a href="http://a.com/1">a</a> <A HREF="http://b.com/2">b</A>"""
    assert(links(h) == Seq("http://a.com/1", "http://b.com/2"))
  }

  test("null markup yields null text and links") {
    val out = Markup.extract(
      Seq((1L, null: String)).toDF("id", "h"), "id", "h").head()
    assert(out.isNullAt(1) && out.isNullAt(2) && out.isNullAt(3))
  }

  test("extract is per-row only: no exchange in the plan") {
    val df = Markup.extract(
      Seq((1L, "<p>x</p>")).toDF("id", "h"), "id", "h")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"markup extract must not shuffle:\n$plan")
  }

  test("extractLinks catches single-quoted and unquoted hrefs; quoted " +
    "values keep inner spaces") {
    val html = "<a href=\"http://d.com/a b\">1</a>" +
      "<a href='http://s.com/x'>2</a><a href=http://u.com/y>3</a>"
    val got = Seq((1L, html)).toDF("id", "h")
      .select(graft.textstats.Markup.extractLinks(col("h")))
      .head().getSeq[String](0)
    assert(got == Seq("http://d.com/a b", "http://s.com/x", "http://u.com/y"),
      got.toString)
  }

  test("an unclosed <script> (truncated crawl record) cannot leak JS into " +
    "the text column") {
    val html = "<p>bye</p><script>var a=1; function f(){ if(a<2){a++;}"
    val txt = Seq((1L, html)).toDF("id", "h")
      .select(graft.textstats.Markup.extractText(col("h")))
      .head().getString(0)
    assert(txt == "bye", s"JS leaked: '$txt'")
    // a commented-out opener must NOT swallow the document tail
    val html2 = "<p>a</p><!-- <script> --><p>b</p>"
    val txt2 = Seq((1L, html2)).toDF("id", "h")
      .select(graft.textstats.Markup.extractText(col("h")))
      .head().getString(0)
    assert(txt2 == "a b", s"comment fallback broke: '$txt2'")
  }
}
