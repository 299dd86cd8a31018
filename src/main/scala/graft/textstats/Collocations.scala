package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** PMI collocation mining — which adjacent word pairs co-occur far more
  * than chance (Church & Hanks 1990): the corpus-analysis step behind
  * tokenizer/vocabulary design (multi-word units worth single tokens),
  * boilerplate phrase discovery, and feature engineering. PMI(w1, w2) =
  * ln(P(w1,w2) / (P(w1)·P(w2))) = ln(c12·N / (c1·c2)).
  *
  * Exactness: counts are int64; the ratio is computed in DOUBLE as
  * (c12·N)/(c1·c2) with every count cast first — IEEE multiply/divide on
  * identical operands is bit-identical across engines, so the single
  * ln·10⁶ floor carries the one documented ulp risk (the q77/LmScore
  * statement). The c12 ≥ minCount gate kills the low-count noise PMI is
  * notorious for AND bounds the output.
  *
  * Scale shape: two map-side-combined count aggregations (bigrams,
  * unigrams — both vocabulary-bounded after combine, so the exchanges
  * carry (string, count) rows, not token instances), the corpus total as
  * a broadcast single-row crossJoin, and the unigram joins left to AQE
  * (vocabulary can exceed broadcast at corpus scale — the Keywords
  * reasoning). Bigram enumeration is IN-ROW (zip of the token array with
  * its own tail) — no positional explode-join.
  */
object Collocations {

  /** (w1, w2, c12, pmi_u): every adjacent pair occurring ≥ `minCount`
    * times, with integer-micro PMI. */
  def pmiBigrams(docs: DataFrame, textCol: String,
                 minCount: Long = 5L): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = TextFunctions.tokens(col(textCol))
    // adjacent pairs via the array zipped with its own tail, in the row
    val tail1 = greatest(size(toks) - 1, lit(0))
    val pairs = docs.select(explode(zip_with(
      slice(toks, lit(1), tail1),
      slice(toks, lit(2), tail1),
      (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = docs.select(explode(toks).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum("c").as("n_tok"))
    c12
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("pmi_u", floor(log(
        (col("c12").cast("double") * col("n_tok").cast("double")) /
          (col("c1").cast("double") * col("c2").cast("double"))) * 1e6)
        .cast("long"))
      .select("w1", "w2", "c12", "pmi_u")
  }

  /** Next-token suggestion table — the bigram-LM read: per leading
    * token, its top-k followers by count with the exact conditional
    * probability in bp (c12 div leading-position total). The
    * boilerplate-chain / autocomplete complement to [[pmiBigrams]]:
    * PMI surfaces SURPRISING pairs, this surfaces the DOMINANT
    * continuations (near-10000 bp rows are template chains worth
    * collapsing before training). `rank` is the follower's true rank
    * among ALL followers of its leading token ((c12 desc, w2 asc) total
    * order); `minCount` only prunes low-evidence output rows, so rank
    * gaps are honest. Same in-row bigram zip as [[pmiBigrams]]; the
    * rank window partitions per leading token over its follower frame —
    * vocabulary-bounded, never the corpus. */
  def nextTokenTable(docs: DataFrame, textCol: String, k: Int = 3,
                     minCount: Long = 5L): DataFrame = {
    require(k >= 1 && minCount >= 1,
      s"k and minCount must be >= 1, got $k/$minCount")
    import org.apache.spark.sql.expressions.Window
    val toks = TextFunctions.tokens(col(textCol))
    val tail1 = greatest(size(toks) - 1, lit(0))
    val pairs = docs.select(explode(zip_with(
        slice(toks, lit(1), tail1),
        slice(toks, lit(2), tail1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "")
    val c12 = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val lead = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val w = Window.partitionBy("w1")
      .orderBy(col("c12").desc, col("w2").asc)
    c12.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k && col("c12") >= minCount)
      .join(lead, Seq("w1"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("rank"),
        expr("(10000 * c12) div c1").as("prob_bp"))
  }
}
