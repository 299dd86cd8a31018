package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-wide column profile: one row per column with row count, null
  * count, exact distinct count, and min/max — the data-quality gate run
  * before a corpus enters the pipeline (a column that is suddenly 40%
  * null, or whose distinct count collapses, is an upstream extraction
  * bug caught here rather than as a mystery three stages later).
  *
  * ONE aggregation computes every metric (multi-column count(DISTINCT)
  * plans through Spark's Expand — k branches for k columns, each
  * map-side combined), and the per-column layout is a plan-side melt of
  * that single row (explode over a literal struct array) — no driver
  * collect, no per-column jobs, one pass over the data. min/max surface
  * as strings so one schema fits every column type; profile only columns
  * whose string form is canonical on both engines (integers, strings —
  * not floats, whose formatting is engine-specific) when an oracle will
  * replay it. */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val melted = explode(array(cols.map(c => struct(
      lit(c).as("column"),
      col("__n").as("n_rows"),
      col(s"__null_$c").as("n_null"),
      col(s"__dist_$c").as("n_distinct"),
      col(s"__min_$c").as("min_s"),
      col(s"__max_$c").as("max_s"))): _*))
    one.select(melted.as("p")).select("p.*")
  }

  /** Order-independent dataset checksum per group — the data-versioning /
    * replica-verification primitive: two pipeline stages (or two
    * clusters) holding the same logical slice produce the same
    * fingerprint regardless of row order, partitioning, or file layout.
    *
    * Per row: the q25 polynomial hash ([[graft.textstats.TextStats
    * .fingerprintBase]], portable to the SQL oracle) of the
    * '|'-concatenated `encodeCols`, in TWO independent base channels
    * (31, 37); per group: row count + the xor-fold of each channel.
    * bit_xor is commutative/associative, so the aggregate is one
    * map-side-combined pass with no ordering requirement anywhere — the
    * property a sum-based checksum only gets by risking overflow (and
    * engine-specific overflow semantics).
    *
    * PRECONDITION (documented, not patched): `encodeCols` must include a
    * unique key — xor cancels PAIRS of identical encodings, so only a
    * unique key makes "identical rows" impossible and the checksum
    * injective-in-practice. concat_ws skips NULLs identically on both
    * engines; include only columns whose string form is canonical on
    * both (integers, strings — the [[profile]] rule). */
  def datasetFingerprint(df: DataFrame, groupCol: String,
                         encodeCols: Seq[String]): DataFrame = {
    require(encodeCols.nonEmpty, "datasetFingerprint needs encode columns")
    val enc = concat_ws("|", encodeCols.map(c => col(c).cast("string")): _*)
    df.select(col(groupCol),
        graft.textstats.TextStats.fingerprintBase(enc, 31).as("__h31"),
        graft.textstats.TextStats.fingerprintBase(enc, 37).as("__h37"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(__h31)").as("fp31"),
        expr("bit_xor(__h37)").as("fp37"))
  }
}
