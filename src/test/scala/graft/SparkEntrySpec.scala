package graft

class SparkEntrySpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY §7 scoreboard counts are the code's counts (no drift)") {
    // the r4 verdict flagged hand-maintained counts drifting from the
    // code; this pins them mechanically. SURVEY §7 declares
    // "NN queries in `SparkEntry.queries`; MM with DuckDB oracles" and
    // "§2 has KK rows" — parse and compare.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val qDecl = """(\d+) queries\s*\nin `SparkEntry\.queries`""".r
      .findFirstMatchIn(survey).map(_.group(1).toInt)
    val oDecl = """(\d+) with DuckDB oracles""".r
      .findFirstMatchIn(survey).map(_.group(1).toInt)
    val rowsDecl = """§2 has (\d+) rows""".r
      .findFirstMatchIn(survey).map(_.group(1).toInt)
    val rowsActual = """(?m)^\| (\d+) \|""".r
      .findAllMatchIn(survey).map(_.group(1).toInt).max
    assert(qDecl.contains(SparkEntry.queries.size),
      s"SURVEY says $qDecl queries, code has ${SparkEntry.queries.size}")
    assert(oDecl.contains(SparkEntry.oracleSql.size),
      s"SURVEY says $oDecl oracles, code has ${SparkEntry.oracleSql.size}")
    assert(rowsDecl.contains(rowsActual),
      s"SURVEY §7 says $rowsDecl rows, §2 table tops out at $rowsActual")
  }

  test("all cheap relational queries run at sf0.001 and return rows") {
    val cheap = Seq("q01_read_project", "q02_cast_dropna", "q03_dedup_exact",
      "q04_left_join", "q05_clean_text", "q06_binarize", "q07_elite_fill",
      "q08_filter_isin", "q09_explode_topn", "q10_wordcount_hist",
      "q11_group_count", "q12_token_df", "q21_multimodal_meta", "q22_langid",
      "q23_quality", "q24_token_count", "q25_fingerprint",
      "q31_min_window_hash", "q37_elite_dist")
    cheap.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
