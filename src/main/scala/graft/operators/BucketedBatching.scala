package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucket-by-sequence-length batching plan — the boundary-respecting
  * alternative to row 70's concat-and-chunk packer, the
  * Tensor2Tensor/fairseq `bucket_by_sequence_length` shape: documents
  * quantize to power-of-two length classes, and a bin of class 2ᵏ holds
  * exactly `seqLen div 2ᵏ` whole documents — no document ever splits
  * across sequences (the property summarization/contrastive training
  * needs), padding waste bounded below 50% by the quantization, and the
  * whole layout a closed form over per-class ranks: bin = rank div
  * capacity, slot = rank mod capacity.
  *
  * The class is an integer identity — next-pow2(n) = 1 << bitlen(n−1)
  * with bitlen = length(bin(·)) — so both engines agree bit-for-bit.
  * Docs with n_tok > seqLen are EXCLUDED by contract (chunk first, row
  * 80 — a planner that silently splits them would undo its own
  * guarantee); empty docs carry no tokens and are excluded with them.
  *
  * Scale shape, the [[Curriculum]] rank rule: per-class ranks come from
  * per-(class, id-range-bucket) counts rolled into a ≤ classes·nBuckets
  * offsets frame (windowed per class over bucket rows — config-bounded,
  * never the corpus) broadcast back onto cell-local row_numbers; the id
  * span arrives via one broadcast single-row attach. Shuffles carry
  * (id, n_tok) scalars only.
  */
object BucketedBatching {

  /** (id, n_tok, class_size, bin, slot) for every doc with
    * 1 ≤ n_tok ≤ seqLen. */
  def plan(df: DataFrame, idCol: String, tokCol: String,
           seqLen: Int = 128, nBuckets: Int = 256): DataFrame = {
    require(seqLen > 0 && nBuckets > 0, "seqLen and nBuckets must be > 0")
    // a non-pow2 seqLen would give the top quantized class (> seqLen/2,
    // rounded up past seqLen) a ZERO capacity and divide the plan by it —
    // fail loud at the API instead
    require((seqLen & (seqLen - 1)) == 0,
      s"seqLen must be a power of two (got $seqLen): classes are pow2 " +
        "and the top class's capacity seqLen div class would be 0")
    val base = df
      .filter(col(idCol).isNotNull && col(tokCol).isNotNull &&
        col(tokCol) >= 1 && col(tokCol) <= seqLen)
      .select(col(idCol).as("id"), col(tokCol).cast("long").as("n_tok"))
      .withColumn("class_size",
        when(col("n_tok") <= 1L, lit(1L))
          .otherwise(expr(
            "shiftleft(1L, cast(length(bin(n_tok - 1)) as int))")))
    val span = base.agg(min("id").as("__i0"), max("id").as("__i1"))
    val keyed = base.join(broadcast(span))
      .withColumn("__bucket",
        expr(s"((id - __i0) * $nBuckets) div (__i1 - __i0 + 1)"))
      .drop("__i0", "__i1")
    val counts = keyed.groupBy("class_size", "__bucket")
      .agg(count(lit(1)).as("__cnt"))
    val offsets = counts
      .withColumn("__off",
        coalesce(sum("__cnt").over(
          Window.partitionBy("class_size").orderBy("__bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
          col("__cnt"), lit(0L)))
      .select(col("class_size"), col("__bucket"), col("__off"))
    keyed
      .join(broadcast(offsets), Seq("class_size", "__bucket"))
      .withColumn("__local", row_number().over(
        Window.partitionBy("class_size", "__bucket").orderBy("id")))
      .withColumn("__rank", col("__off") + col("__local") - 1L)
      .withColumn("__cap", expr(s"$seqLen div class_size"))
      .select(col("id"), col("n_tok"), col("class_size"),
        expr("__rank div __cap").as("bin"),
        expr("__rank % __cap").as("slot"))
  }
}
