package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag (and drop) training documents that
  * share long word-n-grams with an evaluation/benchmark set, the standard
  * guard against test-set leakage in LLM training corpora (GPT-3 App. C /
  * PaLM-style n-gram overlap, here with configurable n).
  *
  * Scale shape: the BENCHMARK side is small by definition (eval suites are
  * thousands of documents, not billions), so its distinct gram-hash set
  * broadcasts; the corpus side is ONE scan — per-row shingling via the
  * native codegen [[graft.functions.ShingleHashes]] chain, a broadcast
  * hash semi-join, and a partially-aggregated (id, hits) count. The corpus
  * is never shuffled by content; only flagged (id, count) pairs move.
  *
  * Grams ride as 64-bit hashes (hash-set intersection counts equal string
  * -gram intersection counts absent xxhash64 collisions, ~|grams|²/2⁶⁵ —
  * the same argument the n-gram Jaccard oracle documents). Use n large
  * enough that chance overlap is meaningful signal (8 word-grams here vs
  * 8-13 in the published pipelines); documents shorter than n tokens
  * collapse to one whole-document gram on both sides, so short eval items
  * are matched exactly rather than skipped.
  */
object Decontaminate {

  /** ONE gram pipeline for every variant (shingle → explode → join on the
    * gram → per-id hit count), parameterized only by how the benchmark
    * gram set reaches the join — this is what makes the variants' "output
    * identical by construction" guarantee structural rather than a
    * three-way copy that must be edited in lockstep. */
  private def gramJoinHits(corpus: DataFrame, benchmark: DataFrame,
                           idCol: String, textCol: String,
                           n: Int, minHits: Int,
                           benchHint: DataFrame => DataFrame): DataFrame = {
    require(n >= 1 && minHits >= 1)
    val cg = MinHashDedup.shingleSets(corpus, idCol, textCol, n)
      .select(col("id"), explode(col("sh")).as("g"))
    val bg = MinHashDedup.shingleSets(benchmark, idCol, textCol, n)
      .select(explode(col("sh")).as("g")).distinct()
    cg.join(benchHint(bg), "g")
      .groupBy("id").agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** (id, hits): corpus documents sharing ≥ `minHits` distinct n-grams
    * with the benchmark, and how many they share. */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 8, minHits: Int = 1): DataFrame =
    gramJoinHits(corpus, benchmark, idCol, textCol, n, minHits, broadcast)

  /** [[contaminationHits]] without the broadcast contract: both gram
    * streams shuffle on the gram hash. For when the "benchmark" side is
    * NOT an eval suite — deduplicating a corpus against another corpus
    * (e.g. "remove anything sharing 8-grams with the previous training
    * run's data"), where gram sets run to billions and neither broadcast
    * nor a Bloom bitset fits an executor. Costs one content shuffle of
    * both sides' (id, gram) streams — the honest price of two unbounded
    * inputs; AQE remains free to pick the strategy per actual sizes. */
  def contaminationHitsShuffle(corpus: DataFrame, benchmark: DataFrame,
                               idCol: String, textCol: String,
                               n: Int = 8, minHits: Int = 1): DataFrame =
    gramJoinHits(corpus, benchmark, idCol, textCol, n, minHits, identity)

  /** [[contaminationHits]] with a Bloom-filter pre-filter on the corpus
    * scan — the 100 TB shape for when the benchmark gram set outgrows a
    * comfortable broadcast-join relation.
    *
    * A broadcast hash-join relation costs ~40-60 bytes per gram on every
    * executor; the Bloom bitset costs `bitsPerItem` BITS (16 by default —
    * a 30-to-1 memory ratio) and rides the plan as an `array<long>` literal
    * probed inside whole-stage codegen ([[graft.functions.BloomContains]]).
    * Bloom filters have no false negatives, so gating the gram stream on
    * the bitset BEFORE the exact confirm join preserves the output exactly
    * while the join only ever sees true hits plus the ~0.05% false-positive
    * trickle — at 100 TB that turns a broadcast probe per corpus gram into
    * a bitset probe per corpus gram, and shrinks the confirm join's input
    * by ~99.9% (for very large eval sets the confirm side could then even
    * be a shuffle join; it stays broadcast here since the gram LIST, unlike
    * the probe structure, is only materialized once per executor).
    *
    * The benchmark gram hashes are collected once on the driver to build
    * the bitset — bounded by definition (eval suites are thousands of
    * documents; `maxGrams` fail-fasts if that assumption breaks) and the
    * same cardinality any broadcast formulation materializes per executor.
    */
  def contaminationHitsBloom(corpus: DataFrame, benchmark: DataFrame,
                             idCol: String, textCol: String,
                             n: Int = 8, minHits: Int = 1,
                             bitsPerItem: Int = 16,
                             maxGrams: Int = 16 << 20): DataFrame = {
    require(n >= 1 && minHits >= 1)
    val spark = corpus.sparkSession
    val grams = MinHashDedup.shingleSets(benchmark, idCol, textCol, n)
      .select(explode(col("sh")).as("g")).distinct()
      .limit(maxGrams + 1)
      .collect().map(_.getLong(0))
    require(grams.length <= maxGrams,
      s"benchmark side exceeds $maxGrams distinct grams — not an eval-suite" +
        " shape; use contaminationHitsShuffle (no broadcast/bitset) instead")
    val (bits, k) = graft.functions.BloomFilterSet.build(grams, bitsPerItem)
    // confirm set from the already-collected hashes: a LocalRelation, so the
    // benchmark is shingled exactly once
    import spark.implicits._
    val bg = grams.toSeq.toDF("g")
    val cg = MinHashDedup.shingleSets(corpus, idCol, textCol, n)
      .select(col("id"), explode(col("sh")).as("g"))
    cg.filter(graft.functions.BloomContains(spark, col("g"), bits, k))
      .join(broadcast(bg), "g")
      .groupBy("id").agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }

  /** Corpus minus contaminated documents (left-anti on the flagged ids). */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String,
                    n: Int = 8, minHits: Int = 1): DataFrame = {
    val flagged = contaminationHits(corpus, benchmark, idCol, textCol, n,
      minHits).select(col("id").as("__contaminated_id"))
    corpus.join(flagged, col(idCol) === col("__contaminated_id"), "left_anti")
  }

  /** Internal-duplication report (the corpus measured against ITSELF): for
    * each document, how many of its distinct word-n-gram spans also occur
    * in at least one OTHER document — the span-level duplication measure of
    * Lee et al.'s exact-substring study, reported per doc as
    * (id, n_grams, n_dup, dup_bp = n_dup·10⁴ div n_grams). Paragraph
    * dedup ([[ParagraphDedup]]) acts on structural units; this sees spans
    * that cross paragraph boundaries or live inside reflowed text.
    *
    * Scale shape: one (gram-hash, id) shuffle for the doc-frequency agg
    * (map-side combined — per-doc grams are already distinct), and the
    * per-gram df joins back on the SAME gram-hash key, co-partitioned with
    * the first shuffle. Text never moves; grams ride as 64-bit hashes with
    * the collision argument the class doc states. */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 8): DataFrame = {
    // materialization contract (Guards.materialize): the grams diamond is
    // eagerly localCheckpointed — blocks are reclaimed by the
    // ContextCleaner on GC or by Guards.releaseMaterialized (clearCache
    // CANNOT see checkpoint blocks); Bench/Verify release per query
    val grams = graft.Guards.materialize(
      MinHashDedup.shingleSets(docs, idCol, textCol, n)
        .select(col("id"), explode(col("sh")).as("g")))
    val df = grams.groupBy("g")
      .agg(countDistinct(col("id")).as("__dfd"))
    grams.join(df, "g")
      .groupBy("id").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__dfd") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_bp", expr("n_dup * 10000L div n_grams"))
  }

  /** Gram-novelty attribution — the per-document CONTRIBUTION measure the
    * span report above inverts: for each doc, the share of its distinct
    * n-gram hashes first INTRODUCED by it corpus-wide (first = min doc id
    * over the gram — the arrival-order convention of every keep-first
    * dedup in this library). The corpus-freshness read behind "is this
    * source still adding anything" mixture decisions and crawl-frontier
    * prioritization: a slice whose new documents carry near-zero novel
    * grams is re-crawling what the corpus already holds.
    *
    * Every doc with ≥ 1 gram appears; an exact copy of an earlier doc
    * scores 0 bp, the earliest doc of any duplicate family 10000 bp on
    * the shared grams it introduced.
    *
    * Scale shape: the q84 diamond verbatim — one (gram-hash, id) explode
    * persisted, a map-side-combined min(id) per gram bounded by distinct
    * grams, and a co-partitioned join back; text never shuffles, only
    * (long, long) pairs. Same hash≈gram identification caveat as q16/q84,
    * same oracle answer: the referee replays gram STRINGS. */
  def noveltyAttribution(docs: DataFrame, idCol: String, textCol: String,
                         n: Int = 8): DataFrame = {
    // cache contract: as duplicateSpans above.
    val grams = graft.Guards.materialize(
      MinHashDedup.shingleSets(docs, idCol, textCol, n)
        .select(col("id"), explode(col("sh")).as("g")))
    val firsts = grams.groupBy("g").agg(min(col("id")).as("__first"))
    grams.join(firsts, "g")
      .groupBy("id").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000L div n_grams"))
  }

  /** Distinct gram-hash frontier of a corpus — the persisted index
    * [[noveltyAgainstIndex]] probes: one `(g)` row per distinct n-gram
    * hash, built once per history and appended per ingest batch (union +
    * distinct, or just append and let the probe's join semantics absorb
    * duplicates — membership is idempotent). */
  def gramIndex(docs: DataFrame, idCol: String, textCol: String,
                n: Int = 8): DataFrame =
    MinHashDedup.shingleSets(docs, idCol, textCol, n)
      .select(explode(col("sh")).as("g")).distinct()

  /** Incremental novelty vs a persisted gram frontier — the ingest-time
    * form of [[noveltyAttribution]] (the rows-79/100/118 shape for the
    * novelty measure): today's batch is scored against ALL history
    * through the staged `(g)` index without history ever re-shingling.
    * A gram is novel iff it is absent from the index AND this doc is its
    * min-id owner WITHIN the batch (two arrivals of the same new phrase
    * credit one doc, the batch-internal arrival rule).
    *
    * Plan shape: the increment's gram frame BROADCASTS onto the index
    * scan for the membership probe (the index, the 100 TB side, is
    * scanned once and never shuffled); the hit set — bounded by the
    * increment's grams — broadcasts back for the anti step. Nothing
    * index-sized moves. */
  def noveltyAgainstIndex(increment: DataFrame, idCol: String,
                          textCol: String, index: DataFrame,
                          n: Int = 8): DataFrame = {
    val grams = graft.Guards.materialize(
      MinHashDedup.shingleSets(increment, idCol, textCol, n)
        .select(col("id"), explode(col("sh")).as("g")))
    val probe = grams.select("g").distinct()
    val hits = index.join(broadcast(probe), "g").distinct()
    val firsts = grams.groupBy("g").agg(min(col("id")).as("__first"))
      .join(broadcast(hits.withColumn("__hit", lit(1L))), Seq("g"), "left")
    grams.join(firsts, "g")
      .groupBy("id").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("id") && col("__hit").isNull, 1L)
          .otherwise(0L)).as("n_novel"))
      .withColumn("novelty_bp", expr("n_novel * 10000L div n_grams"))
  }
}
