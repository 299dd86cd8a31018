package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeEncode

/** Byte-pair-encoding merge-table training (Sennrich et al. 2016): the
  * real tokenizer-building step of an LLM data pipeline, complementing the
  * BPE-ish regex COUNTER in [[TextStats]] with an actual learned subword
  * vocabulary, applied at scale by the native
  * [[graft.functions.BpeEncode]] expression.
  *
  * Scale shape: the word-frequency dictionary is computed DISTRIBUTED
  * (explode → map-side-combined groupBy; the shuffle carries distinct
  * words per partition, not the corpus) and only the top-`maxDict`
  * (count DESC, word ASC — a total order, so the cut is deterministic)
  * rows reach the driver: the bounded driver action of the k-means /
  * bloom-build precedent, documented here. The merge loop then runs on
  * that dictionary alone — O(numMerges · Σ|word|) — exactly as in the
  * reference algorithm, where training on a frequency dict (not the raw
  * corpus) IS the standard formulation. Deterministic end to end:
  * the optional `sampleMod` slice is a pure function of the text hash,
  * and merge ties break on the lexicographically smallest pair.
  */
object Bpe {

  /** Learn `numMerges` merges; returns rank-ordered `"left<U+0001>right"`
    * entries ready for [[graft.functions.BpeEncode]]. Words longer than
    * `maxWordLen` are excluded from TRAINING (pathological unbroken blobs
    * would dominate the pair counts; they still ENCODE fine — their pairs
    * just never become merges). Pass the same normalization (e.g.
    * `lower(trim(text))`) the encode side will use. */
  def trainMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  sampleMod: Long = 1L, maxDict: Int = 10000,
                  maxWordLen: Int = 32): Seq[String] = {
    require(numMerges >= 0 && maxDict > 0 && sampleMod >= 1)
    val sample =
      if (sampleMod <= 1L) docs
      else docs.filter(pmod(xxhash64(col(textCol)), lit(sampleMod)) === 0L)
    val dict: Array[(Array[String], Long)] = sample
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")).between(1, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w")).limit(maxDict)
      .collect()
      .map(r => (BpeEncode.codePointSymbols(r.getString(0)).toArray, r.getLong(1)))

    val merges = scala.collection.mutable.ArrayBuffer.empty[String]
    var words = dict
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      // pair frequencies over the current symbol sequences, weighted by
      // word count — ALL occurrences count, matching the apply pass
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // deterministic argmax: highest count, then smallest (a, b)
        val ((a, b), _) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        merges += s"$a${BpeEncode.Sep}$b"
        words = words.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val ns = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                ns += a + b; j += 2
              } else { ns += syms(j); j += 1 }
            }
            (ns.toArray, n)
          }
        }
        round += 1
      }
    }
    merges.toSeq
  }
}
