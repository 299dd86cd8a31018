package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Per-document keyword extraction: the top-k terms of each document by a
  * tf/df rarity score — the corpus-level "what is this document about"
  * operator (doc-topic tagging, index keys, near-dup explanation).
  *
  * Score is `tf·10⁶ div df_docs` in pure int64 arithmetic (`div`, not `/`:
  * float division would make the oracle comparison rounding-dependent —
  * the repo's integer-determinism rule). tf/df is the classic tf-idf
  * ranking with the monotone log dropped: log(N/df) orders identically to
  * N/df for a fixed corpus, and dividing tf by df directly keeps the score
  * integral, N-free, and engine-exact. Ties break on token ascending, so
  * the top-k set is a total order and DuckDB can replay it row-for-row.
  *
  * Scale shape (three shuffles, each on aggregated data):
  *   1. tf: groupBy (doc, token) — partial agg; the exchange carries
  *      (doc, token, count) rows, not token instances.
  *   2. df + score: token-keyed join of tf against the doc-frequency
  *      aggregate. The df side aggregates FROM tf (already one row per
  *      (doc, token)), and the join is left to AQE: at corpus scale the
  *      vocabulary is too large to assume broadcastable, so declaring a
  *      shuffle join that AQE can demote to broadcast when small beats
  *      hard-coding a broadcast that OOMs the driver at 100 TB.
  *   3. top-k: row_number windowed per doc — partition size is one doc's
  *      distinct-token count (bounded by document length), never the
  *      corpus, so there is no skewed-reducer hazard.
  */
object Keywords {

  def topKeywords(docs: DataFrame, idCol: String, textCol: String,
                  topK: Int = 3): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val tf = docs
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(desc("score"), asc("token"))
    tf.join(dfreq, "token")
      .withColumn("score", expr("tf * 1000000 div df_docs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("doc_id", "token", "tf", "score", "rank")
  }
}
