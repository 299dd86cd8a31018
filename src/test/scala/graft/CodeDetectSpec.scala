package graft

import graft.textstats.CodeDetect

class CodeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    CodeDetect.codeScore(rows.toDF("id", "text"), "id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap

  test("hand counts: code text scores high, prose scores zero") {
    val got = run(Seq(
      (1L, "def f(x): return x;"),
      (2L, "the quick brown fox jumps over the lazy dog")))
    // code: 19 chars, syms ( ) ; = 3, kw 'def ' + 'return ' = 2
    // → 10000·(3+20)/19 = 12105 → capped 10000
    assert(got(1L) == ((19L, 3L, 2L, 10000L, 1L)), got.toString)
    assert(got(2L) == ((43L, 0L, 0L, 0L, 0L)))
  }

  test("keyword hits count with multiplicity; the cap binds") {
    val got = run(Seq((1L, "();();")))
    assert(got(1L) == ((6L, 6L, 2L, 10000L, 1L)), got.toString)
  }

  test("null and empty text score zero without dividing by zero") {
    val got = run(Seq((1L, null), (2L, "")))
    assert(got(1L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L)))
  }

  test("threshold flags at the boundary; mildly symbolic prose stays " +
    "under it") {
    // 2 symbols in 100 chars → 200 bp < 300: not code
    val prose = "a" * 98 + "()"
    // 3 symbols in 100 chars → 300 bp: exactly at the threshold → code
    // (semicolons only — "();" would also hit the keyword list)
    val edge = "a" * 97 + ";;;"
    val got = run(Seq((1L, prose), (2L, edge)))
    assert(got(1L)._4 == 200L && got(1L)._5 == 0L, got.toString)
    assert(got(2L)._4 == 300L && got(2L)._5 == 1L, got.toString)
  }

  test("plan is a pure row expression: no exchange, no join") {
    val df = Seq((1L, "x")).toDF("id", "text")
    val p = CodeDetect.codeScore(df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
  }
}
