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

  /** (id, hits): corpus documents sharing ≥ `minHits` distinct n-grams
    * with the benchmark, and how many they share. */
  def contaminationHits(corpus: DataFrame, benchmark: DataFrame,
                        idCol: String, textCol: String,
                        n: Int = 8, minHits: Int = 1): DataFrame = {
    require(n >= 1 && minHits >= 1)
    val cg = MinHashDedup.shingleSets(corpus, idCol, textCol, n)
      .select(col("id"), explode(col("sh")).as("g"))
    val bg = MinHashDedup.shingleSets(benchmark, idCol, textCol, n)
      .select(explode(col("sh")).as("g")).distinct()
    cg.join(broadcast(bg), "g")
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
}
