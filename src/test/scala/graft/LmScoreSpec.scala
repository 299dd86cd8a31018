package graft

import org.apache.spark.sql.functions._

import graft.textstats.LmScore

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("charNgrams: all sliding windows; short strings yield empty") {
    val out = Seq(("abcd", 1L), ("ab", 2L), ("", 3L)).toDF("t", "id")
      .select(col("id"), LmScore.charNgrams(col("t"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("abc", "bcd"))
    assert(out(2L) == Seq.empty)
    assert(out(3L) == Seq.empty)
  }

  test("hand-computed cross-entropy on a two-doc corpus") {
    // corpus trigrams: "aaab" -> aaa, aab ; "aaac" -> aaa, aac
    // context "aa": bc = 4; tc(aaa)=2, tc(aab)=1, tc(aac)=1
    // nll_u(aaa) = floor(-ln(2/4)*1e6) = floor(0.693147...e6) = 693147
    // nll_u(aab) = nll_u(aac) = floor(-ln(1/4)*1e6) = 1386294
    val out = Seq((1L, "aaab"), (2L, "aaac")).toDF("id", "t")
    val got = LmScore.trigramCrossEntropy(out, "id", "t")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val expDoc = (2L, 693147L + 1386294L, (693147L + 1386294L) / 2)
    assert(got == Map(1L -> expDoc, 2L -> expDoc))
  }

  test("deterministic contexts score zero; docs under 3 chars drop out") {
    // single doc "abcd": every trigram and context occurs once -> p=1 -> 0
    val got = LmScore.trigramCrossEntropy(
      Seq((1L, "abcd"), (2L, "xy")).toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(got == Map(1L -> ((2L, 0L))))
  }

  test("atypical docs score above fluent docs (the quality signal)") {
    val fluent = (1 to 30).map(i => (i.toLong, "the quick brown fox jumps"))
    val weird = Seq((99L, "zq xv qzx vqz wqx"))
    val got = LmScore.trigramCrossEntropy(
      (fluent ++ weird).toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got(99L) > got(1L))
  }

  test("partitioning-invariant: integer sums are exact, no float drift") {
    val docs = (1 to 200).map(i =>
      (i.toLong, s"doc number $i with some shared text and suffix ${i % 7}"))
      .toDF("id", "t")
    val a = LmScore.trigramCrossEntropy(docs.repartition(1), "id", "t")
      .orderBy("id").collect().toSeq
    val b = LmScore.trigramCrossEntropy(docs.repartition(13), "id", "t")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
