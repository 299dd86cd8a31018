package graft

import graft.dedup.SpanScrub

/** Exact duplicated-span removal: cross-doc and within-doc scrub
  * semantics, short-doc collapse, untouched-doc passthrough, and removal
  * accounting. */
class SpanScrubSpec extends SparkSpec {

  import spark.implicits._

  private def scrub(rows: (Long, String)*) =
    SpanScrub.scrubDuplicateSpans(
      rows.toDF("id", "text"), "id", "text", n = 4)
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("clean_text"), r.getAs[Int]("n_tok"),
          r.getAs[Int]("n_removed"))).toMap

  test("a span shared by two docs is removed from both; unique text kept") {
    val shared = "alpha beta gamma delta"
    val out = scrub(
      1L -> s"one two $shared three",
      2L -> s"$shared four five six",
      3L -> "seven eight nine ten eleven")
    assert(out(1L)._1 == "one two three", s"got ${out(1L)}")
    assert(out(2L)._1 == "four five six", s"got ${out(2L)}")
    assert(out(3L)._1 == "seven eight nine ten eleven")
    assert(out(1L)._3 == 4 && out(2L)._3 == 4 && out(3L)._3 == 0)
  }

  test("a span repeated WITHIN one doc scrubs both occurrences") {
    val out = scrub(
      1L -> "alpha beta gamma delta junk alpha beta gamma delta",
      2L -> "totally unrelated words here now")
    assert(out(1L)._1 == "junk", s"got ${out(1L)}")
    assert(out(1L)._3 == 8)
  }

  test("overlapping duplicated grams scrub their union, not double-count") {
    // 5-token shared run → two overlapping 4-grams, union = 5 tokens
    val run = "alpha beta gamma delta epsilon"
    val out = scrub(1L -> s"pre $run post", 2L -> s"$run tail word four")
    assert(out(1L)._1 == "pre post", s"got ${out(1L)}")
    assert(out(1L)._3 == 5, s"union must be 5 tokens: ${out(1L)}")
  }

  test("exact-copy pair scrubs to empty; short-doc collapse unit is the doc") {
    val out = scrub(
      1L -> "exact copy text here today", // 5 tokens ≥ n: gram-level
      2L -> "exact copy text here today",
      3L -> "tiny pair",                  // < n tokens: whole-doc gram
      4L -> "tiny pair",
      5L -> "tiny alone")                 // < n tokens, unique: kept
    assert(out(1L)._1 == "" && out(2L)._1 == "", s"got ${out(1L)}")
    assert(out(3L)._1 == "" && out(4L)._1 == "", s"got ${out(3L)}")
    assert(out(3L)._3 == 2)
    assert(out(5L)._1 == "tiny alone" && out(5L)._3 == 0)
  }

  test("every input id appears exactly once; n_tok preserved") {
    val df = SpanScrub.scrubDuplicateSpans(
      (1L to 30L).map(i => (i, s"document number $i with words w$i x$i"))
        .toDF("id", "text"), "id", "text", n = 4)
    assert(df.count() == 30)
    assert(df.select("id").distinct().count() == 30)
    assertNoCartesian(df)
  }

  // -------------------------------------------------------------------
  // longDuplicateSpans — the detection half at Lee-et-al span lengths
  // -------------------------------------------------------------------

  private def spans(minTokens: Int, rows: (Long, String)*) =
    SpanScrub.longDuplicateSpans(
      rows.toDF("id", "text"), "id", "text", k = 4, minTokens = minTokens)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_end"), r.getAs[Int]("span_tok")))
      .toSet

  test("a planted long span is reported in both docs with exact bounds") {
    val shared = (1 to 10).map(i => s"shared$i").mkString(" ")
    val out = spans(10,
      1L -> s"pre1 pre2 $shared post1",
      2L -> s"$shared tail1 tail2 tail3",
      3L -> "nothing duplicated in this one at all")
    // doc 1: span covers tokens 2..11; doc 2: tokens 0..9
    assert(out == Set((1L, 2, 11, 10), (2L, 0, 9, 10)), s"got $out")
  }

  test("spans shorter than minTokens are not reported") {
    val shared = "alpha beta gamma delta epsilon" // 5 tokens
    val out = spans(6,
      1L -> s"one two $shared three",
      2L -> s"$shared four five six")
    assert(out.isEmpty, s"got $out")
  }

  test("two separate duplicated runs in one doc yield two span rows") {
    val a = (1 to 6).map(i => s"aa$i").mkString(" ")
    val b = (1 to 6).map(i => s"bb$i").mkString(" ")
    val out = spans(6,
      1L -> s"$a gap1 gap2 gap3 $b",
      2L -> s"$a x1 x2 x3 x4 x5 $b")
    assert(out.count(_._1 == 1L) == 2, s"doc 1 must carry two spans: $out")
    assert(out.count(_._1 == 2L) == 2, s"doc 2 must carry two spans: $out")
    // doc 1: aa-run at 0..5, bb-run at 9..14
    assert(out.contains((1L, 0, 5, 6)) && out.contains((1L, 9, 14, 6)),
      s"got $out")
  }

  test("within-doc repetition qualifies (multiplicity counting)") {
    val run = (1 to 8).map(i => s"rep$i").mkString(" ")
    val out = spans(8, 1L -> s"$run middle $run", 2L -> "unrelated words")
    assert(out.contains((1L, 0, 7, 8)) && out.contains((1L, 9, 16, 8)),
      s"got $out")
  }

  // -------------------------------------------------------------------
  // scrubLongDuplicateSpans — the scrub at the published 50-token length
  // -------------------------------------------------------------------

  test("50-token scrub removes the boilerplate block but spares a short " +
    "shared phrase — where the 8-gram scrub removes both") {
    // alphabetic tokens only: the clean pass strips digits, so "bp1"
    // would collapse to "bp" (the documented cleanText gotcha)
    def tok(p: String, i: Int) =
      s"$p${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
    val boiler = (1 to 60).map(tok("bp", _)).mkString(" ")
    val phrase = (1 to 10).map(tok("ph", _)).mkString(" ")
    val docs = Seq(
      1L -> s"apre aone atwo $boiler apost aend afin",
      2L -> s"bpre bone btwo $boiler bpost bend bfin",
      3L -> s"cpre cone ctwo $phrase cpost cend cfin",
      4L -> s"dpre done dtwo $phrase dpost dend dfin").toDF("id", "text")
    val long = SpanScrub.scrubLongDuplicateSpans(docs, "id", "text",
      k = 8, minTokens = 50).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Int]("n_removed")))).toMap
    assert(long(1L) == (("apre aone atwo apost aend afin", 60)),
      s"got ${long(1L)}")
    assert(long(2L)._2 == 60)
    // the 10-token phrase is below the published cutoff: kept intact
    assert(long(3L)._2 == 0 && long(3L)._1.contains("phab phac"),
      s"got ${long(3L)}")
    assert(long(4L)._2 == 0)
    // the gram-level scrub removes BOTH — the granularity difference
    val gram = SpanScrub.scrubDuplicateSpans(docs, "id", "text", n = 8)
      .collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("n_removed")).toMap
    assert(gram(1L) == 60 && gram(2L) == 60, s"got $gram")
    assert(gram(3L) == 10 && gram(4L) == 10, s"got $gram")
  }

  test("scrubLongDuplicateSpans: every id exactly once, clean corpus " +
    "untouched, plan join-safe") {
    val df = SpanScrub.scrubLongDuplicateSpans(
      (1L to 25L).map(i => (i, s"unique doc $i words w$i x$i y$i z$i"))
        .toDF("id", "text"), "id", "text", k = 4, minTokens = 8)
    assert(df.count() == 25)
    assert(df.filter(df("n_removed") > 0).count() == 0)
    assertNoCartesian(df)
  }

  test("short docs never qualify; plan is join-safe") {
    val df = SpanScrub.longDuplicateSpans(
      (Seq(1L -> "tiny pair", 2L -> "tiny pair") ++
        (3L to 20L).map(i => i -> s"unique doc $i body w$i x$i y$i"))
        .toDF("id", "text"), "id", "text", k = 4, minTokens = 4)
    assert(df.filter(df("id").isin(1L, 2L)).count() == 0)
    assertNoCartesian(df)
  }
}
