package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Exact n-gram Jaccard similarity via a shingle inverted index.
  *
  * Candidate pairs come from an equi-join on shared shingles (a posting-list
  * join), not an all-pairs comparison. A document-frequency cap drops "hot"
  * shingles whose posting lists would blow up quadratically — the standard
  * prefix-filtering-style guard: a shingle shared by >maxDf docs contributes
  * candidates that near-certainly fail the threshold anyway, and at 100 TB
  * an uncapped hot key is the difference between a join and an outage.
  * Verification re-computes exact Jaccard on the distinct shingle sets.
  */
object NGramJaccard {

  /** (id, distinct word-n-gram set). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
      array_distinct(
        MinHashDedup.shingles(TextFunctions.tokens(col(textCol)), n)).as("sh"))

  /** Pairs (id_a < id_b) with exact Jaccard ≥ threshold. */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 1000): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, n)
    val posting = sets.select(col("id"), explode(col("sh")).as("g"))
    // drop hot shingles: df > maxDf (tiny agg, broadcast-anti-joined back)
    val hot = posting.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("g")
    val cold = posting.join(broadcast(hot), Seq("g"), "left_anti")
    val pairs = cold.as("l").join(cold.as("r"),
        col("l.g") === col("r.g") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    pairs
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
