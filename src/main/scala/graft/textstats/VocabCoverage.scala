package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Tokenizer-vocabulary coverage audit: fix the vocabulary to the top-K
  * corpus words and report, per source, how much of the token stream
  * falls OUTSIDE it — the truncation study run before freezing any
  * word-level vocab (the reference's CountVectorizer vocabSize knob,
  * Scalable_Project_ML_Model_Analysis.py:141, turned into the audit that
  * justifies the knob's value), and the cheap proxy for cross-source
  * tokenizer fit: a source whose OOV rate is an outlier is a source the
  * tokenizer under-serves (the fertility/coverage check in tokenizer
  * papers, e.g. XLM-R §3.1, at whitespace-word granularity).
  *
  * Scale shape: two passes over the token stream, never a corpus-sized
  * state. Pass 1 counts words — a vocabulary-bounded shuffle (counts,
  * not positions) — and takes the top-K by (count desc, word asc):
  * deterministic ties, TakeOrdered over the distinct-word frame. Pass 2
  * re-tokenizes (cheaper at 100 TB than materializing the exploded
  * stream) and LEFT-joins the BROADCAST K-row vocab, aggregating
  * per-source totals: occurrences, OOV occurrences, distinct OOV types,
  * and OOV basis points by integer div (exact on both engines; null when
  * a source contributes zero tokens rather than a division error).
  *
  * Tokens are [[TextFunctions.tokens]] (clean → lower → split), empty
  * tokens dropped — the q12 pipeline and its SQL mirror verbatim.
  */
object VocabCoverage {

  /** The exploded, empty-filtered (source, token) stream — q12's pipeline. */
  private[graft] def tokenStream(docs: DataFrame, textCol: String,
                                 sourceCol: String): DataFrame =
    docs.select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")

  /** Top-`vocabSize` corpus words by (count desc, word asc) — the frozen
    * vocabulary both the batch audit and the streaming monitor check
    * against. Deterministic ties; vocabulary-bounded count shuffle. */
  def topVocab(docs: DataFrame, textCol: String, sourceCol: String,
               vocabSize: Int): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive, got $vocabSize")
    tokenStream(docs, textCol, sourceCol)
      .groupBy("token").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), asc("token")).limit(vocabSize)
      .select(col("token"))
  }

  def oovReport(docs: DataFrame, textCol: String, sourceCol: String,
                vocabSize: Int): DataFrame = {
    val vocab = topVocab(docs, textCol, sourceCol, vocabSize)
      .withColumn("__in", lit(1))
    tokenStream(docs, textCol, sourceCol)
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("tokens"),
        count(when(col("__in").isNull, 1)).as("oov_tokens"),
        countDistinct(when(col("__in").isNull, col("token"))).as("oov_types"))
      .withColumn("oov_bp", expr(
        "CASE WHEN tokens = 0 THEN NULL ELSE (oov_tokens * 10000) div tokens END"))
  }
}
