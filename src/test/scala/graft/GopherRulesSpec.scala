package graft

import graft.textstats.GopherRules

class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def auditOne(text: String,
                       minWords: Int = 3, maxWords: Int = 10,
                       mwlLoDeci: Int = 20, mwlHiDeci: Int = 80,
                       maxSymbolBp: Int = 1000, minAlphaBp: Int = 8000,
                       minStopHits: Int = 1) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    GopherRules.audit(df, "doc_id", "text", minWords, maxWords,
      mwlLoDeci, mwlHiDeci, maxSymbolBp, minAlphaBp, minStopHits)
      .collect().head
  }

  test("hand-computed metrics on a clean sentence") {
    // "the quick brown fox" — 4 words, 16 non-ws chars, 19 chars, 0 symbols,
    // 4 alpha words, 1 stop hit ("the")
    val r = auditOne("the quick brown fox")
    assert(r.getAs[Long]("n_words") == 4L)
    assert(r.getAs[Long]("mwl_deci") == 40L)   // (10*16) div 4
    assert(r.getAs[Long]("symbol_bp") == 0L)
    assert(r.getAs[Long]("alpha_bp") == 10000L)
    assert(r.getAs[Long]("stop_hits") == 1L)
    assert(r.getAs[Long]("keep") == 1L)
  }

  test("each rule fails independently") {
    // too few words
    assert(auditOne("hi there", minWords = 3).getAs[Long]("r_words") == 0L)
    // too many words
    assert(auditOne((1 to 11).map(_ => "word").mkString(" "))
      .getAs[Long]("r_words") == 0L)
    // mean word length too long: one 12-char word
    assert(auditOne("abcdefghijkl the fox", mwlHiDeci = 50)
      .getAs[Long]("r_mwl") == 0L)
    // symbol-heavy
    val sym = auditOne("the fox #### 1234 %%%%")
    assert(sym.getAs[Long]("symbol_bp") > 1000L &&
      sym.getAs[Long]("r_symbol") == 0L)
    // numeric tokens drop the alpha share
    val num = auditOne("1 2 3 4 5 the fox")
    assert(num.getAs[Long]("alpha_bp") < 8000L &&
      num.getAs[Long]("r_alpha") == 0L)
    // no stopword evidence
    assert(auditOne("quick brown fox jumps").getAs[Long]("r_stop") == 0L)
  }

  test("keep is the conjunction of all five rules") {
    val r = auditOne("quick brown fox jumps") // only r_stop fails
    assert(r.getAs[Long]("r_words") == 1L && r.getAs[Long]("r_mwl") == 1L &&
      r.getAs[Long]("r_symbol") == 1L && r.getAs[Long]("r_alpha") == 1L &&
      r.getAs[Long]("r_stop") == 0L && r.getAs[Long]("keep") == 0L)
  }

  test("empty text stays defined (split yields one empty token)") {
    val r = auditOne("")
    assert(r.getAs[Long]("n_words") == 1L)
    assert(r.getAs[Long]("mwl_deci") == 0L)
    assert(r.getAs[Long]("symbol_bp") == 0L)
    assert(r.getAs[Long]("keep") == 0L)
  }

  test("zero shuffles: the audit is a pure per-row projection") {
    val df = GopherRules.audit(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text")
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      df.queryExecution.executedPlan.toString)
  }
}
