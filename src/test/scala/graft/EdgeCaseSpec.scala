package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ExactDedup, MinHashDedup, NGramJaccard, SimHash}
import graft.functions.TextFunctions
import graft.operators.Relational
import graft.textstats.TextStats

/** Degenerate and adversarial inputs: empty frames, single rows, unicode,
  * null text. Operators must return empty/sane results, not throw. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private val empty = Seq.empty[(Long, String)].toDF("id", "text")
  private val one = Seq((1L, "only one document here")).toDF("id", "text")

  test("dedup operators on empty and single-row input") {
    assert(ExactDedup.keepFirst(empty, Seq("text"), "id").count() == 0)
    assert(MinHashDedup.nearDuplicates(empty, "id", "text", 0.5).count() == 0)
    assert(MinHashDedup.nearDuplicates(one, "id", "text", 0.5).count() == 0)
    assert(SimHash.nearDuplicates(one, "id", "text", 3).count() == 0)
    assert(NGramJaccard.similarPairs(one, "id", "text", 3, 0.5).count() == 0)
  }

  test("text functions on null, empty, and unicode text") {
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "héllo wörld — naïve café 日本語"),
      (4L, "   ")).toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.cleanText(col("text")).as("clean"),
      TextFunctions.wordCount(col("text")).as("wc"),
      TextStats.qualityScore(col("text")).as("q")).collect()
    assert(out.length == 4)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(1))                       // null propagates
    assert(byId(2L).getString(1) == "")
    // non-ASCII letters survive the ASCII punct/digit strip
    assert(byId(3L).getString(1).contains("héllo"))
    assert(byId(3L).getString(1).contains("日本語"))
    assert(byId(4L).getString(1) == "")
  }

  test("pii / repetition / sampling on null, empty, and degenerate input") {
    import graft.operators.Sampling
    import graft.textstats.{Pii, Repetition}
    val df = Seq((1L, "plain text"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
    // null text propagates as null counts/redaction, never throws
    val pii = Pii.withPiiStats(df, "text").orderBy("id").collect()
    assert(pii(2).isNullAt(pii(2).fieldIndex("n_email")))
    assert(pii(2).isNullAt(pii(2).fieldIndex("redacted")))
    assert(pii(1).getLong(pii(1).fieldIndex("n_email")) == 0)
    val rep = df.select(Repetition.distinctTokenBp(col("text")).as("bp"))
      .collect()
    assert(rep(2).isNullAt(0)) // null in, null out
    // null sampling keys are dropped (null < threshold is null -> filtered)
    val nullKeys = Seq(Some(1L), None).map(Tuple1(_)).toDF("id")
      .select(col("id"), lit("s").as("stratum"))
    assert(Sampling.stratifiedSample(nullKeys, "stratum", Map.empty, 10000,
      Sampling.hashBp(col("id"))).count() == 1)
    // empty frames flow through decontamination and sampling
    import graft.dedup.Decontaminate
    assert(Decontaminate.contaminationHits(empty, empty, "id", "text").count() == 0)
  }

  test("histogram and topN on empty input") {
    assert(Relational.histogram(empty.select(col("id")), col("id"), 10)
      .count() == 0)
    assert(Relational.topNByCount(empty, "text", 5).count() == 0)
  }

  test("saltedJoin on empty sides") {
    val emptyKeyed = Seq.empty[(Long, String)].toDF("k", "v")
    val dim = Seq((1L, "x")).toDF("k", "w")
    assert(Relational.saltedJoin(emptyKeyed, dim, "k", 4).count() == 0)
    assert(Relational.saltedJoin(dim, emptyKeyed.withColumnRenamed("v", "w2"),
      "k", 4).count() == 0)
  }
}
