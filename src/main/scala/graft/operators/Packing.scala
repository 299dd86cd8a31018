package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing planner: assign every document a position in the
  * fixed-length training sequences a tokenizer/packer will emit — the
  * GPT-style concat-and-chunk layout (documents concatenated in a
  * deterministic order, the stream chunked into `seqLen`-token sequences;
  * a document may span two sequences).
  *
  * The plan is pure window arithmetic over token counts — no tokens or
  * text move. Scale shape: a single global concatenation order would be
  * one running-sum window in ONE task; instead documents are hashed into
  * `nBuckets` independent packing streams (`bucket = pmod(id, nBuckets)`),
  * each packed in id-order by its own partition-local running sum. Buckets
  * pack in parallel and sequences are keyed (bucket, bin); the only cost
  * versus a global order is ≤ one partially-filled trailing sequence per
  * bucket — at 100 TB, nBuckets of ~waste tokens against full parallelism.
  *
  * Output columns (appended): `bucket`, `bin` (which sequence the document
  * STARTS in), `offset` (token offset of the document's first token within
  * that sequence). Every value is integer arithmetic on integer token
  * counts — bit-exact against the DuckDB window oracle.
  */
object Packing {

  def planPacking(df: DataFrame, idCol: String, tokenCountCol: String,
                  seqLen: Int, nBuckets: Int): DataFrame = {
    require(seqLen > 0 && nBuckets > 0)
    val bucket: Column = pmod(col(idCol).cast("long"), lit(nBuckets.toLong))
    // explicit ROWS frame: the default RANGE frame sums peer rows together,
    // so two rows with an equal id would both see the peer-inclusive total
    // (double-claimed offsets, orphaned tokens); ROWS matches the oracle's
    // `ROWS UNBOUNDED PRECEDING`. The token count joins the ORDER so
    // equal-id rows take a deterministic order too — rows identical in
    // BOTH columns are interchangeable (same (bin, offset) multiset), so
    // the output is run- and partitioning-stable for any input
    val w = Window.partitionBy("bucket")
      .orderBy(col(idCol), col(tokenCountCol).cast("long"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = coalesce(
      sum(col(tokenCountCol).cast("long")).over(w) -
        col(tokenCountCol).cast("long"),
      lit(0L)) // tokens packed before this doc within its bucket
    df.withColumn("bucket", bucket)
      .withColumn("__before", before)
      // integer `div`, not floor(a/b): Divide promotes to double, and past
      // 2^53 cumulative tokens the float quotient can land in the wrong
      // bin while the exact pmod offset stays right (the repo's standard
      // integer-div determinism rule)
      .withColumn("bin", expr(s"__before div ${seqLen}"))
      .withColumn("offset", pmod(col("__before"), lit(seqLen.toLong)))
      .drop("__before")
  }

  /** Efficiency audit of a [[planPacking]] layout — the numbers that
    * decide the `seqLen`/`nBuckets` knobs and whether a doc-boundary-
    * respecting packer (the [[graft.operators.Chunking]] family) is worth
    * its waste: per bucket,
    *
    *   - `n_docs`, `total_tokens` — volume;
    *   - `n_bins` = ceil(total/seqLen) — sequences this bucket emits;
    *   - `tail_waste` = n_bins·seqLen − total — padding tokens in the one
    *     partially-filled trailing sequence (concat-and-chunk fills every
    *     other bin exactly, so tail waste IS the bucket's total waste);
    *   - `fill_bp` — total·10⁴ div capacity (10000 for an empty bucket:
    *     nothing requested, nothing wasted);
    *   - `split_docs` — documents straddling ≥ 1 sequence boundary (each
    *     costs a mid-document attention break at training time);
    *   - `splits` — total boundary crossings ((offset+n_tok−1) div seqLen
    *     per doc: a doc longer than several sequences counts each
    *     crossing).
    *
    * One map-side-combined aggregate over the plan frame; all-integer, so
    * the DuckDB replay is exact. `tokenCountCol` must be the column
    * [[planPacking]] packed (null token counts pack at (bin 0, offset 0)
    * by the planner's coalesce and are excluded from token sums on both
    * engines). */
  def auditPacking(plan: DataFrame, tokenCountCol: String,
                   seqLen: Int): DataFrame = {
    require(seqLen > 0)
    val tok = col(tokenCountCol).cast("long")
    plan.groupBy("bucket").agg(
        count(lit(1)).as("n_docs"),
        coalesce(sum(tok), lit(0L)).as("total_tokens"),
        count(when(col("offset") + tok > seqLen, 1)).as("split_docs"),
        coalesce(sum(expr(
          s"CASE WHEN $tokenCountCol > 0 " +
            s"THEN (offset + $tokenCountCol - 1) div $seqLen " +
            "ELSE 0 END")), lit(0L)).as("splits"))
      .withColumn("n_bins",
        expr(s"(total_tokens + ${seqLen - 1}) div $seqLen"))
      .withColumn("tail_waste",
        col("n_bins") * seqLen - col("total_tokens"))
      .withColumn("fill_bp", expr(
        s"CASE WHEN n_bins = 0 THEN 10000 " +
          s"ELSE total_tokens * 10000 div (n_bins * $seqLen) END"))
  }
}
