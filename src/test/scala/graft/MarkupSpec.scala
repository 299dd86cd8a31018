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
}
