package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Character-entropy quality signal — the cheap gibberish detector the
  * heuristic battery (row 37) lacks: keyboard mash, base64 blobs and
  * binary-in-text score HIGH entropy, looping/repeated generations and
  * padding score LOW; both tails are cut by entropy gates in C4-style
  * cleaning. Shannon entropy over the document's character distribution:
  *
  *   H = ln L − (Σ_c n_c · ln n_c) / L                 (nats)
  *
  * Integer projection (the rows-76/102 discipline): ONE ln·10⁶ floor per
  * distinct character count and one for L (each the single allowed ln
  * per scalar, q77 ulp caveat), int64 products/sums, one final integer
  * division — ent_mu = max(0, ⌊ln L·10⁶⌋·L − Σ n_c·⌊ln n_c·10⁶⌋) div L.
  * The max(0, ·) clamps the pathological near-single-character giant doc
  * where floor error could exceed the (tiny) true entropy — documented,
  * deterministic, and identical on both engines (negative operands would
  * otherwise hit the div-vs-floor-division sign mismatch).
  *
  * Scale shape: one (id, char) map-side-combined count aggregate (the
  * per-doc alphabet bounds rows at |alphabet| per doc), one per-doc sum,
  * a left join back so every input id survives (empty docs: len 0,
  * ent_mu 0). Text never shuffles — only (id, char, count). */
object Entropy {

  /** (id, len, ent_mu): character count and Shannon entropy in
    * micro-nats for every input row. */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cf = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), "")).as("c"))
      .filter(col("c") =!= "")
      .groupBy("id", "c").agg(count(lit(1)).as("n"))
    val t = cf
      .withColumn("t_u",
        col("n") * floor(log(col("n").cast("double")) * 1e6).cast("long"))
      .groupBy("id")
      .agg(sum("n").as("len"), sum("t_u").as("sum_u"))
      .withColumn("ent_mu", expr(
        "greatest(CAST(0 AS BIGINT), " +
          "CAST(floor(ln(CAST(len AS DOUBLE)) * 1000000) AS BIGINT) * len " +
          "- sum_u) div len"))
    docs.select(col(idCol).as("id")).join(t, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("len"), lit(0L)).as("len"),
        coalesce(col("ent_mu"), lit(0L)).as("ent_mu"))
  }
}
