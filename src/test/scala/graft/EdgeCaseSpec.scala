package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ExactDedup, MinHashDedup, NGramJaccard, ParagraphDedup, SimHash}
import graft.functions.TextFunctions
import graft.operators.{Debounce, Relational}
import graft.similarity.KnnLabel
import graft.textstats.{LmScore, TextStats}

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

  test("round-4 operators on empty and degenerate input") {
    import graft.operators.{Chunking, Sampling}
    import graft.textstats.Keywords
    import graft.similarity.Centroids
    assert(Relational.rollupStats(empty.withColumn("n", lit(1L)),
      "id", "text", "n").count() == 0)
    assert(Relational.pivotCounts(empty, "id", "text", Seq("a")).count() == 0)
    assert(Chunking.chunkDocs(empty, "id", "text", 10, 5).count() == 0)
    // NULL text keeps its id with one NULL chunk (greatest() ignores the
    // null length on BOTH engines, so the start grid degrades to [0]) —
    // pinned so the id-set-stability contract is explicit
    val withNull = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("id", "text")
    val chunked = Chunking.chunkDocs(withNull, "id", "text", 10, 5)
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq.sorted
    assert(chunked == Seq((1L, None), (2L, Some(""))))
    assert(Keywords.topKeywords(empty, "id", "text").count() == 0)
    assert(Keywords.topKeywords(withNull, "id", "text").count() == 0)
    val scored = Seq.empty[(Long, String, Long)].toDF("id", "g", "s")
    assert(Sampling.topFracByScore(scored, "g", "s", "id", 1, 10).count() == 0)
    assert(Sampling.tokenBudgetSample(scored, "id", "s", 100L,
      Sampling.lcgBp(col("id"))).count() == 0)
    // zero budget admits nothing
    val some = Seq((1L, "g", 5L)).toDF("id", "g", "s")
    assert(Sampling.tokenBudgetSample(some, "id", "s", 0L,
      Sampling.lcgBp(col("id"))).count() == 0)
    val emptyEmb = Seq.empty[(Int, Array[Float])].toDF("label", "embedding")
    assert(Centroids.labelSums(emptyEmb, "label", "embedding").count() == 0)
  }

  test("incremental dedup survives a full write/read index lifecycle") {
    // build index -> write both tables as parquet -> reopen -> probe: the
    // production shape where the corpus exists only as files on disk
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "spark catalyst optimizer rewrites logical plans into physical plans")
    ).toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_idx").toString
    val sets = MinHashDedup.shingleSets(corpus, "id", "text", 3)
    sets.write.parquet(s"$dir/sets")
    MinHashDedup.bandIndex(sets).write.parquet(s"$dir/bands")
    val setsBack = spark.read.parquet(s"$dir/sets")
    val bandsBack = spark.read.parquet(s"$dir/bands")
    val increment = Seq((11L,
      "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    val out = MinHashDedup.incrementalNearDups(increment, "id", "text",
      bandsBack, setsBack, threshold = 0.8)
      .select("new_id", "dup_id").as[(Long, Long)].collect().toSet
    assert(out == Set((11L, 1L)))
  }

  test("round-5 operators on empty and degenerate input") {
    // LM scoring: empty frame and all-too-short docs both yield no rows
    assert(LmScore.trigramCrossEntropy(empty, "id", "text").count() == 0)
    assert(LmScore.trigramCrossEntropy(
      Seq((1L, "ab"), (2L, "")).toDF("id", "text"), "id", "text").count() == 0)
    // paragraph dedup: empty frame in, empty out; single doc unchanged
    assert(ParagraphDedup.keepFirst(empty, "id", "text").count() == 0)
    val solo = ParagraphDedup.keepFirst(one, "id", "text").collect()
    assert(solo.length == 1 && solo.head.getString(2) ==
      "only one document here")
    // debounce: empty frame, and a single event always kept
    val noEv = Seq.empty[(Long, String, Long, Long)]
      .toDF("user_id", "event_type", "ts_us", "event_id")
    assert(Debounce.debounce(noEv, Seq("user_id", "event_type"), "ts_us",
      "event_id", 10L).count() == 0)
    val oneEv = Seq((1L, "a", 5L, 7L))
      .toDF("user_id", "event_type", "ts_us", "event_id")
    assert(Debounce.debounce(oneEv, Seq("user_id", "event_type"), "ts_us",
      "event_id", 10L).count() == 1)
    // kNN labeling: an empty query set yields no predictions (not a crash)
    val emb = (1L to 6L).map(i =>
      (i, Seq.fill(4)(i.toFloat), (i % 2).toInt))
      .toDF("vec_id", "embedding", "label")
    assert(KnnLabel.knnLabel(emb, "vec_id", "embedding", "label",
      col("vec_id") < 0, k = 3).count() == 0)
  }
}
