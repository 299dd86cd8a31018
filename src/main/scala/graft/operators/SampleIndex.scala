package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sample index over the concatenated corpus — the GPT-style
  * dataloader contract (Megatron-LM's GPTDataset index): documents
  * concatenate in id order into one global token stream, training sample s
  * covers global tokens [s·L, (s+1)·L), and the index maps every sample to
  * the (doc, in-doc offset, segment length) pieces that fill it — a trainer
  * fetches sample s by reading ONLY the listed segments, no concatenated
  * corpus is ever materialized. Complements row 70's packer (first-fit into
  * padded bins) and row 224's bucketer (whole-doc bins): this is the
  * zero-padding slicing layout causal LM pretraining actually uses, where
  * documents DO split across samples and every sample except the last is
  * exactly full.
  *
  * All arithmetic is integer and closed-form once each doc knows its global
  * offset: a doc at [off, off+n) intersects samples s ∈ [off div L,
  * (off+n−1) div L], contributing doc_off = max(0, s·L − off) and seg_len =
  * min(off+n, (s+1)·L) − max(off, s·L). A doc emits ⌈n/L⌉+1 rows at most —
  * output is linear in corpus tokens / L.
  *
  * Scale shape — the [[Curriculum]]/[[BucketedBatching]] rank rule applied
  * to SUMS instead of counts: global offsets come from per-id-range-bucket
  * token totals rolled into a ≤ nBuckets offsets frame (windowed over
  * bucket rows — config-bounded, never the corpus) broadcast back onto
  * bucket-local running sums; the id span arrives via one broadcast
  * single-row attach. Shuffles carry (id, n_tok) scalars only; the segment
  * explode runs at the scan with no further exchange.
  */
object SampleIndex {

  /** (sample_id, id, doc_off, seg_len) for every (sample, doc) overlap in
    * the id-order concatenation; docs with n_tok < 1 carry no tokens and
    * are excluded. */
  def plan(df: DataFrame, idCol: String, tokCol: String,
           seqLen: Int, nBuckets: Int = 256): DataFrame = {
    require(seqLen > 0 && nBuckets > 0, "seqLen and nBuckets must be > 0")
    val base = df
      .filter(col(idCol).isNotNull && col(tokCol).isNotNull &&
        col(tokCol) >= 1)
      .select(col(idCol).as("id"), col(tokCol).cast("long").as("n_tok"))
    val span = base.agg(min("id").as("__i0"), max("id").as("__i1"))
    // bucket math in decimal(38,0): the id-native form
    // `(id - __i0) * $nBuckets` overflows on wide spans (an INT id span
    // past 2³¹/nBuckets, a snowflake-style long span past 2⁶³/nBuckets) —
    // under ANSI that's a job-killing error, and without it silently
    // non-monotonic buckets that scramble every global offset
    val keyed = base.join(broadcast(span))
      .withColumn("__bucket",
        expr(s"CAST(((CAST(id AS DECIMAL(38,0)) - __i0) * $nBuckets) div " +
          s"(CAST(__i1 AS DECIMAL(38,0)) - __i0 + 1) AS BIGINT)"))
      .drop("__i0", "__i1")
    val perBucket = keyed.groupBy("__bucket")
      .agg(sum("n_tok").as("__toks"))
    val offsets = perBucket
      .withColumn("__off",
        coalesce(sum("__toks").over(
          Window.orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("__toks"), lit(0L)))
      .select(col("__bucket"), col("__off"))
    val withOff = keyed
      .join(broadcast(offsets), Seq("__bucket"))
      .withColumn("__local",
        sum("n_tok").over(
          Window.partitionBy("__bucket").orderBy("id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("n_tok"))
      .withColumn("off", col("__off") + col("__local"))
    withOff
      .select(col("id"), col("n_tok"), col("off"),
        explode(sequence(
          expr(s"off div $seqLen"),
          expr(s"(off + n_tok - 1) div $seqLen"))).as("sample_id"))
      .select(
        col("sample_id"),
        col("id"),
        greatest(lit(0L), col("sample_id") * seqLen - col("off"))
          .as("doc_off"),
        (least(col("off") + col("n_tok"), (col("sample_id") + 1) * seqLen) -
          greatest(col("off"), col("sample_id") * seqLen)).as("seg_len"))
  }

  /** Truncation-loss audit — the seq-len knob's evidence read BEFORE
    * committing a context length: for each candidate length, per source,
    * how many docs would truncate and how many tokens fall off the end
    * (the naive truncate-don't-pack loader's loss; the [[plan]] layout
    * loses nothing, so this is also the cost of NOT using it). One scan:
    * the candidate lengths explode per row (a per-row generator, no join),
    * then one map-side-combined aggregate per (source, length). */
  def truncationLoss(df: DataFrame, srcCol: String, tokCol: String,
                     seqLens: Seq[Int]): DataFrame = {
    require(seqLens.nonEmpty && seqLens.forall(_ > 0),
      "seqLens must be non-empty and positive")
    df.filter(col(tokCol).isNotNull && col(tokCol) >= 1)
      .select(col(srcCol).as("source"), col(tokCol).cast("long").as("n_tok"))
      .select(col("source"), col("n_tok"),
        explode(array(seqLens.map(l => lit(l.toLong)): _*)).as("seq_len"))
      .groupBy("source", "seq_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_tok") > col("seq_len"), 1L).otherwise(0L))
          .as("docs_trunc"),
        sum("n_tok").as("tokens_total"),
        sum(greatest(col("n_tok") - col("seq_len"), lit(0L)))
          .as("tokens_lost"))
      .withColumn("lost_bp", expr("(10000 * tokens_lost) div tokens_total"))
  }
}
