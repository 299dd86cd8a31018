package graft

import graft.textstats.Scripts

class ScriptsSpec extends SparkSpec {
  import spark.implicits._

  private def profile(s: String) =
    Scripts.profile(Seq((1L, s)).toDF("id", "t"), "id", "t").head()

  test("hand-counted bilingual doc: exact counts, dominance, mixed flag") {
    // привет=6 + мир=3 cyrillic, hello=5 latin; both >= 5% of 14
    val r = profile("привет мир hello")
    val m = r.getValuesMap[Any](Seq("n_latin", "n_cyrillic", "n_script_chars",
      "dom_script", "n_scripts", "mixed"))
    assert(m("n_latin") == 5L && m("n_cyrillic") == 9L &&
      m("n_script_chars") == 14L, s"counts wrong: $m")
    assert(m("dom_script") == "cyrillic" && m("n_scripts") == 2L &&
      m("mixed") == 1L, s"flags wrong: $m")
  }

  test("dominance ties break to the first class in order (deterministic)") {
    val r = profile("abпр") // latin 2, cyrillic 2
    assert(r.getAs[String]("dom_script") == "latin")
  }

  test("no script characters at all -> none, not a crash") {
    val r = profile("12345 .,;")
    assert(r.getAs[Long]("n_script_chars") == 0L &&
      r.getAs[String]("dom_script") == "none" &&
      r.getAs[Long]("mixed") == 0L)
  }

  test("a trace of a second script below the share floor does not trip mixed") {
    // 1 cyrillic char among 100 latin = 99 bp < 500 bp
    val r = profile(("a" * 100) + "д")
    assert(r.getAs[Long]("n_cyrillic") == 1L &&
      r.getAs[Long]("n_scripts") == 1L && r.getAs[Long]("mixed") == 0L)
  }

  test("CJK, Greek, Arabic, Hangul ranges all count") {
    val r = profile("中文 γεια مرحبا 한국")
    assert(r.getAs[Long]("n_cjk") == 2L && r.getAs[Long]("n_greek") == 4L &&
      r.getAs[Long]("n_arabic") == 5L && r.getAs[Long]("n_hangul") == 2L,
      s"got $r")
  }

  test("null text propagates nulls; profile stays exchange-free") {
    val df = Scripts.profile(Seq((1L, null: String)).toDF("id", "t"), "id", "t")
    val r = df.head()
    assert(r.isNullAt(df.columns.indexOf("n_latin")))
    assert(r.getAs[String]("dom_script") == "none")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"profile must not shuffle:\n$plan")
  }
}
