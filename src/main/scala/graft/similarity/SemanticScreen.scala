package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Semantic decontamination screen: flag every corpus item whose embedding
  * is too close (cosine ≥ τ) to ANY item of a reference set — the dense
  * twin of the n-gram benchmark decontamination
  * ([[graft.dedup.Decontaminate]]): n-grams catch verbatim leakage,
  * embeddings catch paraphrased leakage. Reference sets (benchmark eval
  * items, a blocklist of known-bad content) are small by nature; the
  * corpus is the 100 TB side.
  *
  * This is the EXACT screen — a max over every (corpus, ref) cosine — on
  * purpose: decontamination is recall-critical (a missed eval leak poisons
  * the benchmark), so the bucketed shortcut that is right for peer-to-peer
  * near-dup ([[Ann.nearDupByCosineAuto]]) is wrong here unless the miss
  * rate is accepted explicitly. Cost is |refs| dot products per corpus row
  * — linear in the corpus, embarrassingly parallel, no corpus shuffle: the
  * normalized reference set broadcasts onto the corpus scan (the
  * deliberate small-build-side nested-loop, q20's exempt plan shape), and
  * the per-item reduction is a map-side-combined groupBy on the corpus id.
  *
  * Exactness: each pair's cosine is floored to integer micro-units
  * (`cos_uu`), and max/count over int64 are order-independent — the q20
  * determinism contract (both engines normalize and accumulate the dot
  * left-to-right in double, so the doubles are bit-identical and the floor
  * is hash-safe).
  */
object SemanticScreen {

  /** (id, max_cos_uu, n_hits, contaminated): per corpus item, the max
    * micro-cosine against the reference set, how many references clear
    * `tauMicro`, and the 0/1 screen verdict.
    *
    * Count-then-cap (the Ann.incrementalCosineDups house rule): the
    * reference set is cardinality-probed with a SHARED materialization
    * ([[graft.Guards.underCapShared]] — the bounded probe checkpoint is
    * the frame the screen consumes, so reference normalization runs
    * exactly once; against a corpus-sized frame the probe still
    * short-circuits at cap + 1 rows) and BROADCAST only
    * while its row count stays under `maxBroadcastRefs`; past the
    * cap the screen degrades to a partitioned CartesianProduct — each
    * executor streams the corpus against a shuffled slice of the
    * references — instead of hitting the driver broadcast ceiling as an
    * OOM. Rows are identical in both regimes (the pair set and the int64
    * reduction don't depend on the join strategy;
    * SemanticScreenSpec pins the equality and both plan shapes). The
    * all-pairs COST is inherent to the exact screen either way — a
    * truly corpus-sized reference set wants the bucketed
    * [[Ann.nearDupByCosineAuto]] with its declared miss rate, not this
    * operator. */
  def screen(corpus: DataFrame, idCol: String, vecCol: String,
             refs: DataFrame, refIdCol: String, refVecCol: String,
             tauMicro: Long, maxBroadcastRefs: Long = 1000000L): DataFrame = {
    require(tauMicro >= -1000000L && tauMicro <= 1000000L,
      s"tauMicro is a micro-cosine in [-1e6, 1e6], got $tauMicro")
    val c = Ann.normalized(corpus, idCol, vecCol, "id", "cvx")
    val r0 = Ann.normalized(refs, refIdCol, refVecCol, "ref_id", "rvx")
    val (rm, rSmall) = graft.Guards.underCapShared(r0, maxBroadcastRefs)
    val r = if (rSmall) broadcast(rm) else rm
    c.crossJoin(r)
      .withColumn("cos_uu",
        floor(DotProduct(corpus.sparkSession, col("cvx"), col("rvx")) * 1e6)
          .cast("long"))
      .groupBy("id")
      .agg(max("cos_uu").as("max_cos_uu"),
        sum(when(col("cos_uu") >= tauMicro, 1L).otherwise(0L)).as("n_hits"))
      .withColumn("contaminated",
        when(col("max_cos_uu") >= tauMicro, 1).otherwise(0))
  }
}
