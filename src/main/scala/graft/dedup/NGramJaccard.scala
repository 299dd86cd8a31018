package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard similarity via a shingle inverted index.
  *
  * Candidate pairs come from an equi-join on shared shingle hashes (a
  * posting-list join), not an all-pairs comparison, and the Jaccard value is
  * computed *from the join itself*: the number of matches per (id_a, id_b)
  * IS the intersection size, so with each posting carrying its document's
  * set size, `jaccard = c / (|A| + |B| - c)` — no re-join of the wide
  * shingle arrays, no per-pair array intersection. The only shuffles are the
  * posting-list exchange (8-byte keys) and the pair-count aggregation.
  *
  * A document-frequency cap drops "hot" shingles whose posting lists would
  * blow up quadratically — the standard prefix-filtering-style guard: at
  * 100 TB an uncapped hot key is the difference between a join and an
  * outage. When the cap fires, intersection counts (and so Jaccard) are
  * *undercounted* for pairs sharing hot shingles — a conservative miss on
  * stopword-like n-grams only; with the default cap the testdata never
  * trips it and results are exact (modulo 64-bit hash collisions).
  */
object NGramJaccard {

  /** (id, distinct word-n-gram hash set) — n-grams ride as 64-bit longs
    * (hashed once via [[MinHashDedup.shingleSets]]' staged projections). */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  n: Int): DataFrame =
    MinHashDedup.shingleSets(docs, idCol, textCol, n)

  /** Pairs (id_a < id_b) with n-gram Jaccard ≥ threshold. */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3, threshold: Double = 0.5,
                   maxDf: Int = 1000): DataFrame = {
    val posting = shingleSets(docs, idCol, textCol, n)
      .select(col("id"), size(col("sh")).as("sz"), explode(col("sh")).as("g"))
    // drop hot shingles: df > maxDf (tiny agg, broadcast-anti-joined back)
    val hot = posting.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("g")
    val cold = posting.join(broadcast(hot), Seq("g"), "left_anti")
    cold.as("l").join(cold.as("r"),
        col("l.g") === col("r.g") && col("l.id") < col("r.id"))
      .groupBy(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .agg(count(lit(1)).as("c"),
        first(col("l.sz")).as("sza"), first(col("r.sz")).as("szb"))
      .withColumn("jaccard",
        col("c").cast("double") / (col("sza") + col("szb") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
