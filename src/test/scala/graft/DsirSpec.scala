package graft

import org.apache.spark.sql.functions._

import graft.textstats.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], targetMax: Long, k: Int) =
    Dsir.importanceWeights(rows.toDF("doc_id", "text"), "doc_id", "text",
      col("doc_id") <= targetMax, buckets = 1024, keepK = k)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("target == raw gives exactly zero weight everywhere") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "beta beta delta"))
    val got = run(docs, targetMax = 2L, k = 1)
    assert(got.values.forall(_._2 == 0L), got.toString)
  }

  test("planted domain: target-word docs score positive and are kept, " +
    "raw-only-word docs negative and dropped; exact micro-nat values") {
    val docs = Seq(
      (1L, "alpha alpha alpha"), (2L, "alpha alpha alpha"),
      (3L, "beta beta beta"), (4L, "beta beta beta"))
    val got = run(docs, targetMax = 2L, k = 2)
    // ct(alpha)=6 cr=6, ct(beta)=0 cr=6, t_tot=6, r_tot=12, B=1024
    val dAlpha = math.floor(math.log((7.0 * 1036.0) / (7.0 * 1030.0)) * 1e6).toLong
    val dBeta = math.floor(math.log((1.0 * 1036.0) / (7.0 * 1030.0)) * 1e6).toLong
    assert(got(1L) == ((3L, 3 * dAlpha, 1L)) && got(2L) == got(1L))
    assert(got(3L) == ((3L, 3 * dBeta, 0L)) && got(4L) == got(3L))
    assert(3 * dAlpha > 0 && 3 * dBeta < 0)
  }

  test("keep marks exactly k docs with deterministic id tiebreak") {
    val docs = (1L to 10L).map(i => (i, "same text here"))
    val got = run(docs, targetMax = 5L, k = 3)
    // all weights tie → lowest ids win
    assert(got.filter(_._2._3 == 1L).keySet == Set(1L, 2L, 3L))
  }

  test("tokens are the cleaned pipeline's: punctuation/case fold together") {
    val docs = Seq((1L, "Alpha, ALPHA!"), (2L, "alpha alpha"))
    val got = run(docs, targetMax = 1L, k = 1)
    assert(got(1L)._1 == 2L && got(1L)._2 == got(2L)._2)
  }

  test("score() under a frozen model keeps tokens the training pool never " +
    "saw: n_tok counts them and they carry the smoothed zero-count delta") {
    val train = Seq(
      (1L, "alpha alpha alpha"), (2L, "alpha alpha alpha"),
      (3L, "beta beta beta"), (4L, "beta beta beta")).toDF("doc_id", "text")
    val delta = Dsir.model(train, "doc_id", "text", col("doc_id") <= 2L)
    val got = Dsir.score(Seq((9L, "alpha zeta")).toDF("doc_id", "text"),
      "doc_id", "text", delta)
      .as[(Long, Long, Long)].collect().head
    def bucket(t: String): Long =
      t.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L) % 1024
    assert(Set("alpha", "zeta").map(bucket).size == 2) // distinct buckets
    // alpha: ct=6 cr=6; zeta unseen: ct=0 cr=0 → smoothed zero-count delta
    val dAlpha = math.floor(math.log((7.0 * 1036.0) / (7.0 * 1030.0)) * 1e6).toLong
    val dUnseen = math.floor(math.log(1036.0 / 1030.0) * 1e6).toLong
    assert(got == ((9L, 2L, dAlpha + dUnseen)), got.toString)
  }

  test("partitioning invariance of weights and keep set") {
    val docs = (0L until 120L)
      .map(i => (i, s"w${i % 7} w${(i * 3) % 11} w${(i * 5) % 13}"))
    val a = run(docs, targetMax = 30L, k = 20)
    val b = Dsir.importanceWeights(
      docs.toDF("doc_id", "text").repartition(7), "doc_id", "text",
      col("doc_id") <= 30L, buckets = 1024, keepK = 20)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(a == b)
  }

  test("delta and keep joins broadcast; token stream never all-pairs-joins") {
    val df = Dsir.importanceWeights(
      sources.Tables.documents(spark, sfDir), "doc_id", "text",
      col("source") === "src0", buckets = 1024, keepK = 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }
}
