package graft

import org.apache.spark.sql.functions._

import graft.textstats.Repetition

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("distinctTokenBp: all-distinct = 10000, half-distinct = 5000") {
    val r = Seq("a b c d", "a a b b").toDF("text")
      .select(Repetition.distinctTokenBp(col("text")).as("bp"))
      .as[Long].collect().toSeq
    assert(r == Seq(10000L, 5000L))
  }

  test("dupLineBp: repeated lines counted, single line = 0") {
    val r = Seq("x\ny\nx\nx", "just one line").toDF("text")
      .select(Repetition.dupLineBp(col("text")).as("bp"))
      .as[Long].collect().toSeq
    assert(r == Seq(5000L, 0L)) // 4 lines, 2 distinct -> (4-2)/4
  }

  test("topNgramStats exact on a hand-built corpus") {
    val df = Seq(
      (1L, "spam spam spam eggs"),   // top token 3, top bigram "spam spam" 2
      (2L, "a b c d"),               // all unique, bigrams unique
      (3L, "solo")                   // one token, no bigrams
    ).toDF("doc_id", "text")
    val out = Repetition.topNgramStats(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(out(0).getLong(3) == 3 && out(0).getLong(4) == 2)
    assert(out(1).getLong(3) == 1 && out(1).getLong(4) == 1)
    assert(out(1).getLong(2) == 10000L)
    assert(out(2).getLong(3) == 1 && out(2).getLong(4) == 0)
  }

  test("topCharNgramStats exact: repeated window counted, short text whole") {
    val df = Seq(
      (1L, "abababab"),   // "abab" windows at 1,3,5 -> top cnt 3
      (2L, "abcdefgh"),   // all distinct -> 1
      (3L, "xy")          // shorter than 4 -> one whole-text gram
    ).toDF("doc_id", "text")
    val got = Repetition.topCharNgramStats(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(got(0).getLong(2) == 3, got(0).toString)
    assert(got(1).getLong(2) == 1)
    assert(got(2).getLong(1) == 2 && got(2).getLong(2) == 1)
  }

  test("topCharNgramStats: NULL text emits one gram row (count 1), " +
    "matching the oracle's [NULL] branch") {
    // the q48 oracle's CASE falls through to [text] = [NULL] and counts
    // it; the null-safe native expression alone would drop the row → 0
    val df = Seq((1L, Option("abcdefgh")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = Repetition.topCharNgramStats(df, "doc_id", "text")
      .orderBy("id").collect()
    assert(got(1).isNullAt(1), "n_chars of NULL text must be NULL")
    assert(got(1).getLong(2) == 1L,
      s"NULL text must count its one null gram: ${got(1)}")
  }

  test("char_gram_hashes: shape + code-point windows + codegen==interpreted") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.CharGramHashes
    def local(t: String, n: Int): Seq[Long] =
      CharGramHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), n)
        .toLongArray().toSeq
    // window count: len−n+1, or exactly one for short strings (incl. "")
    assert(local("abababab", 4).size == 5)
    assert(local("xy", 4).size == 1 && local("", 4).size == 1)
    // equal windows hash equal, distinct windows distinct (here)
    val h = local("abababab", 4)
    assert(h(0) == h(2) && h(2) == h(4) && h(0) != h(1))
    // code-point semantics: multi-byte chars are ONE position, same as
    // substr — "héllo" has 2 windows of 4 chars
    assert(local("héllo", 4).size == 2)
    // codegen path (via the registered function) matches local compute
    val viaPlan = Seq(("ababéba", 1)).toDF("t", "x")
      .select(CharGramHashes(spark, col("t"), 4).as("h"))
      .head().getSeq[Long](0)
    assert(viaPlan == local("ababéba", 4))
    // interpreted eval matches too
    val interp = CharGramHashes(Literal("ababéba"), 4)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    assert(interp == local("ababéba", 4))
  }

  test("hash-based char mode counts == substr-based counts on real corpus") {
    // the collision-risk cross-check promised in topCharNgramStats' doc:
    // recompute with the old substr formulation and demand equality
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(300)
    val t = col("text")
    val grams = when(length(t) >= 4,
      transform(sequence(lit(1), length(t) - 3), i => t.substr(i, lit(4))))
      .otherwise(array(t))
    val ref = docs.select(col("doc_id").as("id"), explode(grams).as("g"))
      .groupBy("id", "g").count()
      .groupBy("id").agg(max("count").as("ref_cnt"))
    val got = Repetition.topCharNgramStats(docs, "doc_id", "text")
      .join(ref, Seq("id"))
    assert(got.filter(col("top_char_ngram_cnt") =!= col("ref_cnt")).isEmpty,
      "hash-mode count diverged from substr-mode count")
    assert(got.count() == 300)
  }

  test("topNgramStats aggregations are partial (map-side combine)") {
    val df = Seq((1L, "a a b")).toDF("doc_id", "text")
    val plan = Repetition.topNgramStats(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"),
      s"expected partial aggregation in plan:\n$plan")
  }

  test("loopSignal: cycling tails flag with the smallest period, prose " +
    "and short docs do not") {
    import spark.implicits._
    val looped = "intro text then " + ("and the " * 20)   // period 8 tail
    val single = "filler " * 8 + "z" * 70                 // period 1 tail
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders away to find a meal somewhere else entirely today"
    val shortLoop = "ababab"                              // period 2, short
    val got = graft.textstats.Repetition.loopSignal(
      Seq((1L, looped), (2L, single), (3L, prose), (4L, shortLoop))
        .toDF("id", "text"), "id", "text")
      .as[(Long, Int, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((8, 1L)), got.toString)
    assert(got(2L) == ((1, 1L)), got.toString)
    assert(got(3L) == ((0, 0L)), got.toString)
    // the period is visible but the window is not filled: no flag
    assert(got(4L) == ((2, 0L)), got.toString)
  }
}
