package graft

import org.apache.spark.sql.functions._

import graft.textstats.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with most marker hits, und otherwise") {
    val df = Seq(
      "the cat and the dog of the house",
      "el perro que la casa",
      "der hund und die katze",
      "le chat et les chiens",
      "xyzzy plugh"
    ).toDF("text").select(TextStats.langId(col("text")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "es", "de", "fr", "und"))
  }

  test("token counts: whitespace vs BPE-ish") {
    val row = Seq("Hello, world 42 times!").toDF("text")
      .select(TextStats.wsTokenCount(col("text")).as("ws"),
        TextStats.bpeTokenCount(col("text")).as("bpe"))
      .head()
    assert(row.getInt(0) == 4)
    // Hello , world 42 times ! -> 6 BPE-ish pieces
    assert(row.getInt(1) == 6)
  }

  test("punctRatio and stopwordRatio bounds and exact values") {
    val row = Seq("ab, 12").toDF("text")
      .select(TextStats.punctRatio(col("text")).as("p"),
        TextStats.stopwordRatio(col("text")).as("s"))
      .head()
    // "ab, 12": 6 chars, 3 punct/digit (",", "1", "2") -> 0.5
    assert(math.abs(row.getDouble(0) - 0.5) < 1e-9)
    assert(row.getDouble(1) == 0.0)
    val s2 = Seq("the dog").toDF("text")
      .select(TextStats.stopwordRatio(col("text")).as("s")).head().getDouble(0)
    assert(math.abs(s2 - 0.5) < 1e-9)
  }

  test("qualityScore: integer basis points, monotone in length") {
    val rows = Seq("short text", ("x " * 400).trim).toDF("text")
      .select(TextStats.qualityScore(col("text")).as("q")).as[Long].collect()
    assert(rows.forall(q => q >= 0 && q <= 10000))
    assert(rows(1) > rows(0))
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fps = Seq("abc def", "abc def", "def abc").toDF("text")
      .select(TextStats.fingerprint(col("text")).as("f")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("minWindowHash is robust to a distant edit, unlike fingerprint") {
    val a = "the quick brown fox jumps over the lazy dog " * 3
    val b = a + "EDITED"
    val rows = Seq(a, b).toDF("text")
      .select(TextStats.fingerprint(col("text")).as("fp"),
        TextStats.minWindowHash(spark, col("text")).as("mw")).collect()
    assert(rows(0).getLong(0) != rows(1).getLong(0)) // full-hash differs
    assert(rows(0).getLong(1) == rows(1).getLong(1)) // min-window survives
  }

  test("fertility rollup math: q149's ratios on a hand frame") {
    // "ab cd!" → ws 2, bpe 3 (ab, cd, !), chars 6
    // "x y-z" → ws 2, bpe 4 (x, y, -, z), chars 5
    val df = Seq(("s1", "ab cd!"), ("s1", "x y-z")).toDF("source", "text")
    val got = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.wsTokenCount(col("text")).cast("long")).as("ws_tokens"),
        sum(TextStats.bpeTokenCount(col("text")).cast("long")).as("bpe_tokens"),
        sum(length(col("text")).cast("long")).as("chars"))
      .select(col("ws_tokens"), col("bpe_tokens"), col("chars"),
        expr("(10000 * bpe_tokens) div ws_tokens").as("f"),
        expr("(100 * chars) div bpe_tokens").as("cpt"))
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == ((4L, 7L, 11L, 17500L, 157L)))
  }
}
