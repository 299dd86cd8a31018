package graft.textstats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-style importance scoring — "select raw-corpus documents that look
  * like the target domain" (Xie et al. 2023, *Data Selection for Language
  * Models via Importance Resampling*), the standard pretraining-mixture
  * step when a small high-quality target corpus (wiki, books) should
  * steer what's kept from a huge raw crawl.
  *
  * Each document scores Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)]
  * under hashed-unigram bag-of-words models with add-one smoothing over
  * `buckets` hash buckets: positive ⇒ the doc's token mix is more
  * target-like than raw-average. Hashing (the q25 polynomial per token,
  * mod `buckets`) makes the model a FIXED-size table independent of
  * vocabulary — the property that lets the same code run at 100 TB, and
  * exactly the trick the paper uses.
  *
  * Determinism contract (the rows-76/102 micro-unit rule): the per-bucket
  * log-ratio is floored to integer micro-nats ONCE, then per-doc scores
  * are int64 sums of those floored values — order/partitioning
  * independent, engine-replayable. Numerator/denominator products stay
  * exact int64; the single `/` is one correctly-rounded double op; the
  * one ln per bucket carries the documented q77 1-ulp caveat.
  *
  * Scale notes: two bucket-bounded map-side-combined count aggregates
  * (≤ `buckets` rows each — broadcastable whatever the corpus size),
  * broadcast single-row totals, then one broadcast join of the delta
  * table onto the token stream and a per-doc partial-agg sum. Token
  * instances never shuffle as rows; the only per-doc shuffle carries
  * (doc_id, int64). Selection is TakeOrdered top-k (per-partition heads,
  * never a global sort shuffle).
  */
object Dsir {

  /** q25 polynomial hash of one token, mod `buckets` — the native
    * [[graft.functions.PolyHash]] scalar (identical values to the SQL
    * fold the oracles replay; this runs once per TOKEN INSTANCE, the
    * hottest per-row site of the fold in the repo). */
  private def bucketOf(token: Column, buckets: Int): Column =
    pmod(graft.functions.PolyHash.columnOf(token), lit(buckets.toLong))

  /** (id, is_t, bucket) token-instance stream. */
  private def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                           isTarget: Column, buckets: Int): DataFrame =
    docs.select(col(idCol).as("id"), isTarget.as("is_t"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .select(col("id"), col("is_t"), bucketOf(col("token"), buckets).as("bucket"))

  /** The frozen model: per-bucket micro-nat log-ratio delta table
    * (bucket, d_u), ≤ `buckets` rows — train once, broadcast anywhere
    * (the batch query and the live scoring stream share it). */
  def model(docs: DataFrame, idCol: String, textCol: String,
            isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    // the token pass feeds THREE aggregates (raw, tgt, totals) — a lazy
    // diamond that re-ran the corpus explode+hash once per consumer
    // (measured on q143: three identical token-pass stages per model
    // build); materialize it once, the importanceWeights convention
    modelFromToks(graft.Guards.materialize(
      tokenBuckets(docs, idCol, textCol, isTarget, buckets)), buckets)
  }

  private def modelFromToks(toks: DataFrame, buckets: Int): DataFrame = {
    // raw = ALL docs (the target is part of the raw corpus here, as in
    // the paper's raw-pool setup); both aggregates are bucket-bounded
    val raw = toks.groupBy("bucket").agg(count(lit(1)).as("cr"))
    val tgt = toks.filter(col("is_t")).groupBy("bucket")
      .agg(count(lit(1)).as("ct"))
    val totals = toks.agg(
      count(lit(1)).as("r_tot"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("t_tot"))
    // emit the FULL bucket domain (still ≤ `buckets` rows): buckets never
    // seen in the raw pool smooth to cr = 0 / ct = 0, so score()'s inner
    // join is lossless even for documents whose tokens the frozen model
    // never saw — the exact frozen-model/streaming use the API advertises
    val domain = toks.sparkSession.range(buckets)
      .select(col("id").as("bucket"))
    domain.join(raw, Seq("bucket"), "left")
      .join(tgt, Seq("bucket"), "left")
      .na.fill(0L, Seq("cr", "ct"))
      .crossJoin(broadcast(totals))
      // smoothing products in decimal(38,0): at the advertised corpus
      // scale (ct ~ 10⁶ per bucket over a ~10¹³-token pool) the bigint
      // product (ct+1)·(r_tot+buckets) crosses 2⁶³ and ANSI kills the
      // job; decimal keeps the product exact, and its double cast — the
      // same one the old bigint division performed implicitly — keeps
      // every non-overflowing value bit-identical
      .select(col("bucket"),
        expr(s"CAST(floor(ln(" +
          s"CAST((ct + 1) * CAST(r_tot + $buckets AS DECIMAL(38,0)) AS DOUBLE) / " +
          s"CAST((cr + 1) * CAST(t_tot + $buckets AS DECIMAL(38,0)) AS DOUBLE)" +
          s") * 1000000) AS BIGINT)")
          .as("d_u"))
  }

  /** (id, n_tok, w_u): per-document weight under a frozen `delta` model —
    * pure transforms + a broadcast stream-static-joinable lookup + one
    * per-doc sum, so the SAME code scores a batch frame or an arriving
    * stream (weights are additive over token instances: the result is
    * microbatch-boundary-invariant, the q122/q133 property). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            delta: DataFrame, buckets: Int = 1024): DataFrame =
    scoreFromToks(tokenBuckets(docs, idCol, textCol, lit(false), buckets),
      delta)

  private def scoreFromToks(toks: DataFrame, delta: DataFrame): DataFrame =
    // left join + loud miss, not an inner join: the model emits its FULL
    // bucket domain, so a missing delta row means the caller scored with
    // a different bucket count than the model was trained with — an
    // inner join would silently drop those token instances (biased w_u,
    // undercounted n_tok) instead of failing
    toks.join(broadcast(delta), Seq("bucket"), "left")
      .withColumn("d_u", expr(
        "CASE WHEN d_u IS NOT NULL THEN d_u ELSE CAST(raise_error(" +
          "'DSIR bucket miss: score() called with a different bucket " +
          "count than the model was trained with') AS BIGINT) END"))
      .groupBy("id").agg(count(lit(1)).as("n_tok"), sum("d_u").as("w_u"))

  /** (doc_id, n_tok, w_u, keep): per-document importance weight in
    * micro-nats and a keep flag marking the exact top-`keepK` docs by
    * (w_u desc, id asc — deterministic ties). `isTarget` defines the
    * target-domain subset of `docs` (rows where it is true). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 1024,
                        keepK: Int = 100): DataFrame = {
    require(keepK >= 0, s"keepK must be ≥ 0, got $keepK")
    // the token pass (explode + per-char hash) feeds the model's three
    // aggregates AND the scoring join — materialize it once, eagerly
    // (Guards.materialize: a lazy persist was raced into recomputes by
    // the concurrent AQE stage jobs of its four consumers)
    val toks = graft.Guards.materialize(
      tokenBuckets(docs, idCol, textCol, isTarget, buckets))
    // perDoc feeds the top-k selection AND the final keep join —
    // materialize it too (doc-count-sized: id + two longs)
    val perDoc = graft.Guards.materialize(
      scoreFromToks(toks, modelFromToks(toks, buckets)))
    val top = perDoc.orderBy(col("w_u").desc, col("id"))
      .limit(keepK).select(col("id"), lit(1L).as("keep"))
    perDoc.join(broadcast(top), Seq("id"), "left")
      .na.fill(0L, Seq("keep"))
      .select(col("id"), col("n_tok"), col("w_u"), col("keep"))
  }
}
