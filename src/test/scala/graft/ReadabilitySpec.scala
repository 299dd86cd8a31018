package graft

import graft.textstats.Readability

class ReadabilitySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Readability.flesch(rows.toDF("id", "text"), "id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

  test("hand counts: words, sentence runs, vowel groups, fused score") {
    val got = run(Seq((1L, "The cat sat. It ran!")))
    // 5 words, 2 sentence runs, 5 vowel groups:
    // 206835 − (1015·5)//2 − (84600·5)//5 = 206835 − 2537 − 84600
    assert(got(1L) == ((5L, 2L, 5L, 119698L)), got.toString)
  }

  test("no terminal punctuation floors sentences at 1; punctuation runs " +
    "('?!') count once") {
    val got = run(Seq((1L, "aaa bbb"), (2L, "Really?! Yes.")))
    assert(got(1L) == ((2L, 1L, 1L, 162505L)), got.toString)
    // "Really?! Yes." → 2 runs ('?!' and '.'), 2 words, 3 vowel groups
    // (ea, y... — y counts as a vowel: R-ea-lly → ea, y; Yes → e)
    assert(got(2L)._2 == 2L, got.toString)
  }

  test("null and empty text behave identically (the split('') = 1 " +
    "token convention), never dividing by zero") {
    val got = run(Seq((1L, null), (2L, "")))
    assert(got(1L) == got(2L), got.toString)
    assert(got(1L)._1 == 1L && got(1L)._3 == 0L)
    // the class-doc empty-doc constant: 206835 − 1015·1 − 0
    assert(got(1L)._4 == 205820L, got.toString)
  }

  test("long unpunctuated vowel-dense junk scores far below clean prose") {
    val junk = Seq.fill(300)("aeiou").mkString(" ")
    val prose = "This is a clean line. It reads well. Short and clear."
    val got = run(Seq((1L, junk), (2L, prose)))
    assert(got(1L)._4 < 0L, s"junk should go negative: ${got(1L)}")
    assert(got(2L)._4 > 50000L, s"prose should score high: ${got(2L)}")
  }
}
