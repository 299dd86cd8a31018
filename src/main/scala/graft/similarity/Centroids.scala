package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-class embedding centroids — the building block for centroid-based
  * classification, cluster seeding, and per-class drift monitoring over an
  * embedding column.
  *
  * Output is (label, pos, n, sum_uu): element-wise SUMS in integer
  * micro-units plus the class count, from which any consumer derives the
  * mean at whatever precision it wants. Emitting integer sums, not double
  * means, is deliberate twice over:
  *
  *   - Exactness: each component is floored to int micro-units
  *     (`floor(x·10⁶)` on the float→double-promoted value — the same
  *     determinism trick as the ANN queries' `cos_uu`) BEFORE summing, so
  *     the aggregate is an int64 sum — associative, order-independent, and
  *     bit-identical on any engine (a double sum's value depends on
  *     reduction order and would never hash-match an oracle).
  *   - Scale: the explode multiplies rows ×dim, but hash aggregation
  *     partially combines on (label, pos) BEFORE the exchange — the shuffle
  *     carries at most nLabels×dim partial rows per map partition (640
  *     longs here), regardless of corpus size. No collect, no driver math.
  *
  * int64 headroom: |x| ≤ ~10³ per component gives |x_uu| ≤ 10⁹, so overflow
  * needs ~10⁹ vectors per class — and Spark's ANSI-mode sum would fail loud,
  * not wrap, if a corpus ever got there.
  */
object Centroids {

  def labelSums(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("label", "pos")
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * 1000000d).cast("long"))
          .as("sum_uu"))

  /** Streaming twin of [[labelSums]]: per-event-time-window centroid sums —
    * the embedding-drift monitor for a live ingest feed ("did this hour's
    * class-3 centroid move?"). Same integer micro-unit math, so windows are
    * comparable bit-for-bit against any batch baseline computed by
    * [[labelSums]], and against each other across engines and reruns.
    *
    * State is bounded by watermark × (labels × dim) running sums — the
    * per-group state is two longs, nothing buffers rows. Downstream
    * consumers derive the mean and compare to a reference centroid;
    * emitting sums (not means) keeps windows mergeable after the fact.
    * Append mode: a window's row emits once, when the watermark passes it.
    */
  def labelSumsStream(emb: DataFrame, labelCol: String, vecCol: String,
                      tsCol: String, watermark: String,
                      windowLen: String): DataFrame =
    emb
      .withWatermark(tsCol, watermark)
      .select(col(tsCol), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(window(col(tsCol), windowLen), col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("x").cast("double") * 1000000d).cast("long"))
          .as("sum_uu"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("label"), col("pos"), col("n"), col("sum_uu"))

  /** Per-class embedding-norm audit — the ingest sanity gate for a vector
    * column: count, min/max/sum of the L2 norm in integer micro-units,
    * and the zero-vector count (a batch of zero or wildly-scaled vectors
    * is an upstream encoder bug caught HERE, not as silent cosine
    * garbage three stages later).
    *
    * Exactness rides the q20 normalization contract: the norm is
    * IEEE-correctly-rounded sqrt over the left-folded double dot product
    * (the native `vec_dot` expression folds left-to-right exactly like
    * the oracle's list_reduce), floored to micro-units BEFORE
    * aggregating — so min/max/sum are int64 math, order-independent and
    * engine-identical (the [[labelSums]] rule). One map-side-combined
    * aggregate; nothing but (label, long) pairs shuffle. */
  def normAudit(emb: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val spark = emb.sparkSession
    val normUu = floor(sqrt(graft.functions.DotProduct(spark,
      col(vecCol), col(vecCol))) * 1000000d).cast("long")
    emb.select(col(labelCol).as("label"), normUu.as("__nu"))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
        min("__nu").as("min_uu"),
        max("__nu").as("max_uu"),
        sum("__nu").as("sum_uu"),
        count(when(col("__nu") === 0L, 1)).as("n_zero"))
  }

  /** Per-DIMENSION embedding audit — the transpose view of [[normAudit]]:
    * a dimension that is constant across the corpus ("dead" — an encoder
    * bug or a truncated export) or near-saturated contributes nothing
    * but cost to every similarity op downstream, and only a per-dim scan
    * can see it. Values are floored to integer micro-units AT THE ROW
    * (float→double exact, one correctly-rounded multiply, floor), so
    * min/max/sum aggregate as exact int64 — order- and partitioning-
    * independent, unlike float sums, which reassociate. The explode
    * shuffles only (dim, int64) pairs, map-side combined down to one row
    * per dimension. */
  def dimAudit(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("dim", "x")))
      .select(col("dim").cast("long").as("dim"),
        expr("CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)").as("x_u"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        count(when(col("x_u") === 0L, 1)).as("n_zero"),
        min("x_u").as("min_u"),
        max("x_u").as("max_u"),
        sum("x_u").as("sum_u"))
      .withColumn("dead",
        when(col("min_u") === col("max_u"), 1L).otherwise(0L))

  /** Intra-class embedding dispersion via the CENTROID TRICK — the
    * collapse detector for encoder output: mean pairwise dot product
    * among a class's vectors without ever forming a pair, from
    * Σ_pairs v_i·v_j = (‖Σv‖² − Σ‖v‖²)/2, i.e.
    * mean_pair = (‖S‖² − T) / (n(n−1)) with S the component-sum vector
    * and T the summed self-dots. A class whose mean pairwise dot
    * approaches its mean self dot has collapsed to (near-)identical
    * embeddings — representation collapse that silently breaks every
    * cosine op downstream; a healthy class sits far below.
    *
    * Exactness: components floor to micro-units at the row (the
    * [[labelSums]] rule), so T is an exact int64 sum of per-row int64
    * self-dots and S_d are exact int64; ‖S‖² is computed in
    * decimal(38,0) because S_d² can exceed int64 at ~10³ vectors/class.
    * The one division is an integral `div` (truncation toward zero —
    * the oracle mirrors it with a sign-split, since ‖S‖² − T can be
    * negative for anti-correlated classes). Units: µ² (10⁻¹²).
    *
    * Scale shape: one per-row self-dot aggregate + the [[labelSums]]
    * (label, pos) partial aggregate + a label-bounded join — shuffles
    * carry labels×dim longs, never vectors. n = 1 classes report NULL
    * mean_pair (no pairs exist). */
  /** Nearest-class-centroid pseudo-labeling — the Rocchio classifier over
    * embeddings, the O(L) cheap sibling of [[KnnLabel]]'s O(corpus) exact
    * kNN: each query vector takes the label whose MEAN class vector it
    * dots highest with. score(q, l) = (10⁶ · q_u·S_l) div n_l compares
    * mean-centroid dots without materializing a float mean; q components
    * floor to µ at the row, centroid sums are [[labelSums]]' exact int64,
    * so the dot is exact int64 (headroom: 64 dims · 10⁶ · 10⁶·V ≤ 2⁶³
    * until ~10⁵ vectors/class) and the one scaled division runs in
    * decimal with truncation — the oracle sign-splits it since dots of
    * anti-aligned vectors are negative. Winner = (score desc, label asc),
    * a total order.
    *
    * Scale shape: the labeled corpus reduces ONCE to L×dim centroid sums
    * (map-side-combined, the labelSums shape) and BROADCASTS; each query
    * row costs L·dim multiplies in one hash-join + partial-agg pass; the
    * winner window partitions per query over an L-row frame. The labeled
    * corpus itself never joins row-to-row against queries. */
  def centroidAssign(queries: DataFrame, idCol: String, vecCol: String,
                     labeled: DataFrame, labelCol: String,
                     lVecCol: String): DataFrame = {
    val cents = labelSums(labeled, labelCol, lVecCol)
    val q = queries.select(col(idCol).as("qid"),
      posexplode(transform(col(vecCol),
        x => floor(x.cast("double") * 1000000d).cast("long")))
        .as(Seq("pos", "qu")))
    val dots = q.join(broadcast(cents), "pos")
      .groupBy("qid", "label")
      .agg(max("n").as("__n"), sum(expr("qu * sum_uu")).as("__dot"))
      .withColumn("score_u",
        expr("(1000000 * cast(__dot as decimal(38,0))) div __n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("score_u").desc, col("label").asc)
    dots.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("qid"), col("label").as("pred_label"), col("score_u"))
  }

  def dispersion(emb: DataFrame, labelCol: String, vecCol: String)
      : DataFrame = {
    val xu = transform(col(vecCol),
      x => floor(x.cast("double") * 1000000d).cast("long"))
    // self-dot fold and its per-label sum in decimal(38,0), the same
    // widening __s2 below already has: unit vectors give __self ≈ 10¹²,
    // so the int64 sum crosses 2⁶³ at ~9·10⁶ rows per class (and a
    // component near the documented 10³ bound overflows inside the fold
    // itself) — ANSI kills the query exactly at the scale the class doc
    // advertises; decimal keeps every value exact and `div` still
    // returns the same BIGINT means
    val perRow = emb.select(col(labelCol).as("label"),
      aggregate(xu, lit(0).cast("decimal(38,0)"),
        (acc, v) => acc + v.cast("decimal(38,0)") * v).as("__self"))
    val selfT = perRow.groupBy("label")
      .agg(count(lit(1)).as("n"), sum("__self").as("__t"))
    val s2 = labelSums(emb, labelCol, vecCol)
      .groupBy("label")
      .agg(sum(col("sum_uu").cast("decimal(38,0)") *
        col("sum_uu").cast("decimal(38,0)")).as("__s2"))
    selfT.join(s2, "label")
      .withColumn("mean_self_uu2", expr("__t div n"))
      .withColumn("mean_pair_uu2",
        when(col("n") >= 2,
          expr("(__s2 - __t) div (n * (n - 1))")).cast("long"))
      .select("label", "n", "mean_self_uu2", "mean_pair_uu2")
  }
}
