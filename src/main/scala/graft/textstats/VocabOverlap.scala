package graft.textstats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Source-vocabulary analyses: the pairwise overlap matrix behind "are
  * these two slices really distinct data" mixture decisions, and the
  * Heaps-law growth curve behind vocabulary-size knobs.
  *
  * Both run on the distinct (source, token) / (token, first-doc) frames —
  * vocabulary-bounded, so nothing corpus-sized survives the first
  * map-side-combined distinct. Tokens are the q12 pipeline's (cleaned,
  * lower-cased, whitespace-split, empty dropped) — shared definition with
  * the coverage/OOV audits.
  */
object VocabOverlap {

  private def tokenFrame(docs: DataFrame, textCol: String) =
    docs.select(col("*"),
      explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")

  /** Pairwise vocabulary overlap per unordered source pair that SHARES at
    * least one type: (src_a < src_b, v_a, v_b, inter, union via
    * inclusion–exclusion, jaccard_bp). The token self-join is bounded by
    * per-token source lists (≤ |sources|² rows per type), never documents.
    * Zero-overlap pairs don't appear — their Jaccard is 0 by absence. */
  def overlapMatrix(docs: DataFrame, srcCol: String,
                    textCol: String): DataFrame = {
    val vt = tokenFrame(docs, textCol)
      .select(col(srcCol).as("src"), col("token")).distinct()
    val sizes = vt.groupBy("src").agg(count(lit(1)).as("v"))
    val a = vt.select(col("src").as("src_a"), col("token"))
    val b = vt.select(col("src").as("src_b"), col("token"))
    val inter = a.join(b, "token")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("src").as("src_a"), col("v").as("v_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("v").as("v_b")), "src_b")
      .withColumn("u", col("v_a") + col("v_b") - col("inter"))
      .withColumn("jaccard_bp", expr("(10000 * inter) div u"))
      .select("src_a", "src_b", "v_a", "v_b", "inter", "u", "jaccard_bp")
  }

  /** Heaps-law vocabulary growth over the (id-ordered) corpus: the corpus
    * is cut into `nCheckpoints` equal id ranges and each reports the
    * types FIRST seen in it plus the running cumulative — the
    * diminishing-returns read behind vocab-size and crawl-volume knobs.
    * Every type reduces to its min doc id (one vocabulary-bounded
    * aggregate); the bucket histogram and its cumulative window run over
    * ≤ nCheckpoints rows. Requires ids in [0, maxId]; the id range comes
    * from a broadcast single-row attach. */
  def growthCurve(docs: DataFrame, idCol: String, textCol: String,
                  nCheckpoints: Int = 10): DataFrame = {
    val firsts = tokenFrame(docs, textCol)
      .groupBy("token").agg(min(col(idCol)).as("__first"))
    val span = docs.agg(max(col(idCol)).as("__max"))
    val buckets = firsts.join(broadcast(span))
      .withColumn("checkpoint",
        expr(s"(__first * $nCheckpoints) div (__max + 1)"))
      .groupBy("checkpoint").agg(count(lit(1)).as("new_types"))
    // gap-fill: every checkpoint reports, a saturated vocabulary shows
    // as explicit zero-growth rows (the curve's whole point)
    val grid = docs.sparkSession.range(nCheckpoints)
      .select(col("id").as("checkpoint"))
    grid.join(buckets, Seq("checkpoint"), "left")
      .withColumn("new_types", coalesce(col("new_types"), lit(0L)))
      .withColumn("cum_types", sum("new_types").over(
        org.apache.spark.sql.expressions.Window.orderBy("checkpoint")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
  }
}
