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
}
