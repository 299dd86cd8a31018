package graft

import graft.textstats.C4Clean

class C4CleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(docs: Seq[(Long, String)], minWords: Int = 5,
                    minKept: Int = 2) =
    C4Clean.cleanLines(docs.toDF("doc_id", "text"), "doc_id", "text",
      minWords, minKept)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap

  test("line predicates: terminal punctuation, min words, blocklist") {
    val page = Seq(
      "this fine sentence has enough words here.", // kept
      "no terminal punctuation on this long line", // dropped: no [.!?]
      "too short.",                                // dropped: < 5 words
      "lorem ipsum dolor sit amet today.",         // dropped: blocklist
      "please enable JavaScript to view this.",    // dropped: case-folded block
      "code leaks like { this } into crawls.",     // dropped: brace
      "does this question line survive the gate?", // kept: '?' terminal
      "she said \"it ends with a quote.\""         // kept: quote after period
    ).mkString("\n")
    val got = clean(Seq((1L, page)))
    assert(got(1L)._1 == 8L)
    assert(got(1L)._2 == 3L)
    assert(got(1L)._3 ==
      Seq("this fine sentence has enough words here.",
        "does this question line survive the gate?",
        "she said \"it ends with a quote.\"").mkString("\n"))
  }

  test("document gate: fewer than minKeptLines surviving lines drops the doc") {
    val got = clean(Seq(
      (1L, "only one good sentence survives in here.\njunk line"),
      (2L, "first good sentence right here for you.\nsecond good sentence also counts fine.")))
    assert(!got.contains(1L))
    assert(got(2L)._2 == 2L)
  }

  test("order of kept lines is the original document order") {
    val page = Seq(
      "zebra comes first in this document order.",
      "apple comes second in this document order.").mkString("\n")
    val got = clean(Seq((1L, page)))
    assert(got(1L)._3.startsWith("zebra"))
  }

  test("zero shuffles: split/filter/join run in-row") {
    val df = C4Clean.cleanLines(
      Seq((1L, "a.\nb.")).toDF("doc_id", "text"), "doc_id", "text", 1, 1)
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      df.queryExecution.executedPlan.toString)
  }

  test("dehyphenate: lowercase continuations rejoin, uppercase " +
    "continuations (real compounds) stay, counts exact") {
    import spark.implicits._
    val df = Seq(
      (1L, "informa-\ntion and hyphen-\nation"),
      (2L, "state-\nOf-the-art stays"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val got = graft.textstats.C4Clean.dehyphenate(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((2L, "information and hyphenation")), got.toString)
    assert(got(2L) == ((0L, "state-\nOf-the-art stays")))
    assert(got(3L) == ((0L, "")))
  }

  test("tab-padded prose survives the terminal-punctuation gate and tabs " +
    "don't inflate the word count") {
    val docs = Seq((1L,
      "this proper sentence ends with a period.\t\n" +      // trailing tab
        "\tanother fine sentence sits right here.\n" +       // leading tab
        "\tfour lonely words here\n" +                       // 4 words: dies
        "a third good sentence closes the doc.")).toDF("id", "text")
    val out = graft.textstats.C4Clean.cleanLines(docs, "id", "text",
      minWordsPerLine = 5, minKeptLines = 2).collect()
    assert(out.length == 1)
    assert(out.head.getLong(2) == 3L, out.head.toString)
  }
}
