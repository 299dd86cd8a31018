package graft

class SparkEntrySpec extends SparkSpec {

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
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
