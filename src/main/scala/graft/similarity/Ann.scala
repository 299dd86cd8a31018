package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, per the usual correctness/scale split:
  *
  *   - [[bruteForceTopK]] — exact baseline: broadcast the (small) query set,
  *     one linear scan of the corpus, per-query top-k via window rank. The
  *     corpus is never shuffled by similarity; the only exchange is keyed by
  *     query_id and carries corpus_rows × n_queries scored rows. Right answer
  *     at any corpus size; past the query-broadcast cap it degrades to a
  *     shuffled nested-loop plan (same rows) instead of OOMing the driver.
  *   - [[lshTopK]] — scale path: random-hyperplane LSH (Charikar '02 SRP).
  *     Corpus and queries are bucketed by the sign-pattern of `nPlanes`
  *     hyperplane projections; scoring happens only within matching buckets,
  *     so cost is corpus/2^nPlanes per query in expectation. Hyperplanes are
  *     generated driver-side from a fixed seed and embedded as literal
  *     arrays — identical on every executor, no closure capture.
  *
  * Every path L2-normalizes each vector ONCE in a staged projection, so
  * per-pair scoring is a single dot product (cosine(u,v) = û·v̂). Norms are
  * per-row work that scales linearly; pair scoring is the quadratic-ish part
  * and must stay minimal.
  *
  * [[nearDupByCosine]] is the embedding-space near-duplicate operator:
  * self-join on LSH bucket, verify cosine ≥ threshold — never all-pairs.
  */
object Ann {

  /** SRP bucket id of a *materialized* vector column: bit i = sign(v·plane_i).
    * One native [[graft.functions.SrpBuckets]] loop — the previous
    * compositional tree (a sum of `bits` separate `when(vec_dot ≥ 0)`
    * sub-trees per table) overflowed whole-stage codegen's method budget
    * on the multi-table paths and dropped the hottest ANN stage to
    * interpreted eval; values are bit-identical (same seeded plane stream,
    * same ascending dot accumulation, same ≥ 0 sign — Spec5's replays and
    * ExpressionSpec pin it). `spark` is kept for source compatibility; the
    * expression is session-free. */
  def srpBucket(spark: org.apache.spark.sql.SparkSession, vec: Column,
                nPlanes: Int, dim: Int, seed: Long = 42L): Column =
    element_at(graft.functions.SrpBuckets.columnOf(vec, 1, nPlanes, dim, seed), 1)

  /** All L table bucket ids at once — `[t] = srpBucket(vec, bits, dim,
    * seed + t)`, one fused tables×bits×dim loop per row. */
  private def srpBucketsAll(vec: Column, nTables: Int, bits: Int, dim: Int,
                            seed: Long): Column =
    graft.functions.SrpBuckets.columnOf(vec, nTables, bits, dim, seed)

  /** (<idAlias>, <vecAlias>) with the vector L2-normalized, staged so the
    * norm is computed once per row (an inline norm inside a downstream
    * expression would re-evaluate per reference). */
  private[similarity] def normalized(df: DataFrame, idCol: String,
                                     vecCol: String, idAlias: String,
                                     vecAlias: String): DataFrame =
    normalizedCarry(df, idCol, vecCol, idAlias, vecAlias, Nil)

  /** [[normalized]] carrying extra columns through (the
    * [[graft.dedup.MinHashDedup.shingleSetsCarry]] pattern) — label-aware
    * consumers keep their metadata without a second join back to the
    * source frame. */
  private[similarity] def normalizedCarry(df: DataFrame, idCol: String,
                                          vecCol: String, idAlias: String,
                                          vecAlias: String,
                                          carry: Seq[String]): DataFrame =
    df.select(col(idCol).as(idAlias) +: col(vecCol).as("__v") +:
        sqrt(DotProduct(df.sparkSession, col(vecCol), col(vecCol))).as("__n") +:
        carry.map(col): _*)
      // zero vectors stay zero (cos = 0 against everything) — dividing by a
      // zero norm would yield NaN components, and NaN sorts ABOVE every
      // real cosine under desc(), ranking the zero vector as everyone's
      // top match
      .select(col(idAlias) +:
        transform(col("__v"), x =>
          when(col("__n") === 0.0, lit(0.0))
            .otherwise(x.cast("double") / col("__n"))).as(vecAlias) +:
        carry.map(col): _*)

  /** Per-query top-k over a scored frame: rank by `cos` desc (cand_id
    * tiebreak — deterministic), keep ≤ k. The one window formulation every
    * top-k path shares, so tie-breaking/NaN policy can never drift between
    * them; Spark's WindowGroupLimit caps each partition's contribution at k
    * rows per query BEFORE the exchange. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "rank", "cos")
  }

  /** Exact-cosine rescore of a (query_id, cand_id) shortlist against
    * normalized query/corpus frames, then [[rankTopK]]. */
  private def rescoreExact(shortlist: DataFrame, queriesNorm: DataFrame,
                           corpusNorm: DataFrame, k: Int): DataFrame =
    rankTopK(shortlist
      .join(broadcast(queriesNorm), "query_id")
      .join(corpusNorm, "cand_id")
      .withColumn("cos",
        DotProduct(shortlist.sparkSession, col("qvx"), col("cvx"))), k)

  /** Exact cosine top-k of each query against the corpus (self-matches
    * excluded). The query set is count-then-capped (the
    * incrementalCosineDups house rule): broadcast while under
    * `maxBroadcastQueries` rows — the designed regime, one linear corpus
    * scan — and past the cap a shuffled nested-loop plan with identical
    * rows, so a corpus-sized query set degrades to distributed O(|Q|·|C|)
    * scoring instead of OOMing the driver on a multi-GB vector broadcast
    * (the exact work is O(|Q|·|C|) either way; callers needing sublinear
    * scale substitute [[lshTopK]] / [[ivfTopK]]). The 1M default matches
    * the vector-carrying cap of [[SemanticScreen]], not the 4M id-pair
    * caps — these rows carry the embedding. The probe SHARES its
    * materialization with the plan ([[graft.Guards.underCapShared]]):
    * under the cap the query normalization runs exactly once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     maxBroadcastQueries: Long = 1000000L): DataFrame = {
    val q0 = normalized(queries, idCol, vecCol, "query_id", "qv")
    val c = normalized(corpus, idCol, vecCol, "cand_id", "cv")
    val (q, qSmall) = graft.Guards.underCapShared(q0, maxBroadcastQueries)
    val qj = if (qSmall) broadcast(q) else q
    rankTopK(c.join(qj, col("query_id") =!= col("cand_id"))
      .withColumn("cos", DotProduct(corpus.sparkSession, col("qv"), col("cv"))), k)
  }

  /** Margin-based pair mining (Artetxe & Schwenk 2019 — the
    * LASER/CCMatrix bitext-mining criterion): score each forward
    * top-`k` cross-corpus pair by its cosine RELATIVE to both
    * endpoints' neighborhoods,
    *
    *   margin(x, y) = cos(x, y) / (Σ_{NN_k(x)} cos / 2k + Σ_{NN_k(y)} cos / 2k)
    *
    * so a pair is kept for being closer than its endpoints' TYPICAL
    * neighbors, not for raw cosine — hub vectors (moderately close to
    * everything) score high on absolute cosine against every partner
    * and are exactly what the margin deflates. The standard mining step
    * for parallel-corpus construction and any cross-corpus alignment
    * (caption⋈image-embedding, query⋈doc pairs).
    *
    * Integer projection (the q20 contract): cos_uu floored per pair,
    * neighborhood sums as int64 sums of floored values, then ONE
    * integer division — margin_mu = (cos_uu · (na + nb) · 10⁶) div
    * (ska + skb) with na/nb the actual neighbor counts (= min(k, side
    * size)) — engine-replayable bit-for-bit. margin_mu > 10⁶ ⇔ the pair
    * beats its endpoints' average neighborhoods. Pairs whose summed
    * neighborhoods are ≤ 0 (degenerate anti-correlated regions) carry
    * no meaningful ratio and are dropped, documented.
    *
    * Scale shape: two [[bruteForceTopK]] passes (src side must satisfy
    * its broadcast contract — mining runs per src shard in production);
    * the forward pair frame (≤ |src|·k rows) broadcasts onto the
    * tgt-side neighborhood aggregate, so the corpus-sized frame never
    * re-shuffles. */
  def marginMining(src: DataFrame, tgt: DataFrame, idCol: String,
                   vecCol: String, k: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val fwd = bruteForceTopK(tgt, src, idCol, vecCol, k)
      .select(col("query_id").as("src_id"), col("cand_id").as("tgt_id"),
        floor(col("cos") * 1e6).cast("long").as("cos_uu"))
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    val bwd = bruteForceTopK(src, tgt, idCol, vecCol, k)
      .select(col("query_id").as("tgt_id"),
        floor(col("cos") * 1e6).cast("long").as("bcos_uu"))
    val ska = fwd.groupBy("src_id")
      .agg(sum("cos_uu").as("ska"), count(lit(1)).as("na"))
    val skb = bwd.groupBy("tgt_id")
      .agg(sum("bcos_uu").as("skb"), count(lit(1)).as("nb"))
    // pair frame (small) broadcasts onto the corpus-sized tgt aggregate
    skb.join(broadcast(fwd.join(broadcast(ska), "src_id")), Seq("tgt_id"))
      .filter(col("ska") + col("skb") > 0)
      .withColumn("margin_mu",
        expr("(cos_uu * (na + nb) * 1000000) div (ska + skb)"))
      .select("src_id", "tgt_id", "cos_uu", "margin_mu")
  }

  /** Hard-negative mining — the contrastive-training data-prep step
    * (in-batch negatives are mostly easy; retrieval-mined hard negatives
    * are the published recipe, e.g. DPR/ANCE): for each anchor, the exact
    * cosine top-`k` among corpus items carrying a DIFFERENT `labelCol`
    * value. The label inequality is part of the JOIN predicate, not a
    * post-filter on a k-truncated list — a same-label near-twin can never
    * crowd a true negative out of the top-k. Null-labeled rows never pair
    * (SQL null-inequality semantics, documented rather than patched: a
    * label-less item is neither a positive nor a safe negative).
    *
    * Same plan shape as [[bruteForceTopK]] — anchors broadcast, corpus
    * scanned once, per-partition scoring — and the same exactness: this
    * is the auditable baseline the LSH/IVF shortlist variants would be
    * measured against. */
  def hardNegativesTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = normalizedCarry(queries, idCol, vecCol, "query_id", "qv",
      Seq(labelCol)).withColumnRenamed(labelCol, "__ql")
    val c = normalizedCarry(corpus, idCol, vecCol, "cand_id", "cv",
      Seq(labelCol)).withColumnRenamed(labelCol, "__cl")
    rankTopK(c.join(broadcast(q),
        col("query_id") =!= col("cand_id") && col("__ql") =!= col("__cl"))
      .withColumn("cos",
        DotProduct(corpus.sparkSession, col("qv"), col("cv"))), k)
  }

  /** LSH-bucketed top-k: candidates limited to the query's SRP bucket.
    * Trades recall for a 2^nPlanes candidate reduction; recall is measured
    * against [[bruteForceTopK]] in AnnSpec. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int, dim: Int,
              seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("bucket", srpBucket(spark, col("qv"), nPlanes, dim, seed))
    val c = normalized(corpus, idCol, vecCol, "cand_id", "cv")
      .withColumn("bucket", srpBucket(spark, col("cv"), nPlanes, dim, seed))
    rankTopK(c.join(broadcast(q), "bucket")
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", DotProduct(spark, col("qv"), col("cv"))), k)
  }

  /** [[bruteForceTopK]] with the scoring shuffle replaced by the typed
    * [[graft.functions.TopKAggregator]]: map-side partial aggregation caps
    * each partition's contribution at k rows per query BEFORE the exchange,
    * instead of shuffling every scored (query, candidate) row to a window
    * sort. Same results (AnnSpec asserts equality); the plan difference is
    * the one that matters when the scored set is corpus-sized. */
  def bruteForceTopKAgg(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}
    require(Seq(corpus, queries).forall(df =>
      Seq(LongType, IntegerType, ShortType).contains(df.schema(idCol).dataType)),
      s"bruteForceTopKAgg requires an integral id column (TopKAggregator " +
        s"buffers Long ids); got ${corpus.schema(idCol).dataType.simpleString}")
    import corpus.sparkSession.implicits._
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val c = normalized(corpus, idCol, vecCol, "cand_id", "cv")
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id").cast("long"), col("cand_id").cast("long"),
        DotProduct(corpus.sparkSession, col("qv"), col("cv")).as("cos"))
      .as[(Long, Long, Double)]
    val topk = new graft.functions.TopKAggregator(k).toColumn
    scored
      .groupByKey(_._1)
      .mapValues { case (_, cand, cos) => (cand, cos) }
      .agg(topk.name("topk"))
      .toDF("query_id", "topk")
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), col("col._1").as("cand_id"),
        (col("pos") + 1).cast("int").as("rank"), col("col._2").as("cos"))
  }

  /** Train the IVF coarse quantizer: seeded k-means++ init + Lloyd, run
    * LOCALLY on a bounded corpus sample — ~256 training points per centroid
    * (the Faiss training convention), collected to the driver.
    *
    * Why not spark.ml KMeans: the training set is bounded BY CONSTRUCTION
    * (nCentroids×256 rows ≈ 2 MB at 64 dims), while a distributed fit costs
    * ~15 barrier jobs (k-means|| init passes + one per Lloyd iteration) of
    * near-empty tasks — at bench scale those jobs were ~6× the cost of the
    * rest of the query combined, and at 1000 executors they'd be pure
    * scheduler churn for the same 2 MB of math. This is a bounded,
    * documented driver-side computation (same contract as the histogram
    * min/max probe), NOT a driver loop over corpus data: the corpus-sized
    * passes — cell assignment and scoring — stay distributed codegen
    * expressions over the returned centroid literals. */
  private[similarity] def trainCentroids(vecs: DataFrame, vecCol: String,
                                         nCentroids: Int, seed: Long,
                                         maxIter: Int = 10): Array[Array[Double]] = {
    val cap = nCentroids * 256L
    val n = vecs.count()
    require(n > 0, "IVF quantizer training needs a non-empty corpus")
    val sampled =
      if (n <= cap) vecs
      else vecs.sample(withReplacement = false, cap.toDouble / n, seed)
    val pts = sampled.select(vecCol).collect()
      .map(_.getSeq[Double](0).toArray)
    localKMeans(pts, nCentroids, seed, maxIter)
  }

  /** Squared L2 distance of two equal-length local vectors — the hot-loop
    * primitive [[localKMeans]] and [[nearestLocal]] share. */
  private def sqL(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0; val n = a.length
    while (i < n) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Index of the nearest centroid (first wins on ties — the same
    * (distance, cell) ordering as the codegen [[nearestCell]]). */
  private[similarity] def nearestLocal(v: Array[Double],
                                       ctrs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < ctrs.length) {
      val d = sqL(v, ctrs(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The pure k-means++ / Lloyd math over in-memory points — shared by the
    * driver-side [[trainCentroids]] (sampled collect) and the per-shard
    * EXECUTOR-side fit inside [[semanticNearDup]]'s sharded regime.
    * Deterministic given point order and seed. */
  private[similarity] def localKMeans(pts: Array[Array[Double]],
                                      nCentroids: Int, seed: Long,
                                      maxIter: Int = 10): Array[Array[Double]] = {
    val k = math.min(nCentroids, pts.length)
    val dim = pts(0).length
    val rnd = new scala.util.Random(seed)
    // k-means++ seeding: next center drawn ∝ distance² to nearest chosen
    val centers = new Array[Array[Double]](k)
    centers(0) = pts(rnd.nextInt(pts.length)).clone()
    val d2 = Array.fill(pts.length)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var i = 0
      while (i < pts.length) {
        d2(i) = math.min(d2(i), sqL(pts(i), centers(c - 1))); i += 1
      }
      val total = d2.sum
      centers(c) =
        if (total == 0.0) pts(rnd.nextInt(pts.length)).clone()
        else {
          var r = rnd.nextDouble() * total; var j = 0
          while (j < pts.length - 1 && r > d2(j)) { r -= d2(j); j += 1 }
          pts(j).clone()
        }
      c += 1
    }
    // Lloyd to tolerance or maxIter
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val sums = Array.ofDim[Double](k, dim)
      val cnt = new Array[Long](k)
      var i = 0
      while (i < pts.length) {
        val best = nearestLocal(pts(i), centers)
        var j = 0
        while (j < dim) { sums(best)(j) += pts(i)(j); j += 1 }
        cnt(best) += 1
        i += 1
      }
      moved = false
      var cc = 0
      while (cc < k) {
        if (cnt(cc) > 0) {
          val nc = new Array[Double](dim)
          var j = 0
          while (j < dim) { nc(j) = sums(cc)(j) / cnt(cc); j += 1 }
          if (sqL(nc, centers(cc)) > 1e-12) moved = true
          centers(cc) = nc
        }
        cc += 1
      }
      iter += 1
    }
    centers
  }

  /** Nearest-centroid cell id of a vector column — the distributed half of
    * the quantizer: pure codegen argmin over the centroid literals.
    * `array_min` over (d, cell) structs is the O(k) min-reduction (struct
    * ordering breaks distance ties toward the lower cell id, matching
    * [[nearestLocal]]); the previous `array_sort` formulation paid an
    * O(k log k) full sort plus the sorted-copy allocation per row. */
  private def nearestCell(v: Column, centroids: Array[Array[Double]]): Column =
    array_min(array(centroids.zipWithIndex.map { case (ctr, i) =>
      struct(sqDist(v, array(ctr.map(lit): _*)).as("d"), lit(i).as("cell"))
    }: _*))("cell")

  /** IVF (inverted-file) top-k: a sample-trained k-means coarse quantizer
    * (see [[trainCentroids]]) partitions the corpus into `nCentroids`
    * cells; each query probes its
    * `nProbe` nearest cells and scores only those candidates. The classic
    * ANN scale path (Jégou et al., IVF/IVFADC): candidate count per query is
    * ~ corpus × nProbe / nCentroids, and raising nProbe trades latency back
    * for recall. Cell assignment is one codegen argmin pass over the
    * centroid literals (small by construction — they ride to executors
    * inside the expression itself). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nCentroids: Int, nProbe: Int,
              seed: Long = 42L): DataFrame = {
    // normalized corpus feeds the quantizer count+sample AND the cell
    // assignment pass — persist the shared input once (same cache
    // contract as ivfTopKQuantized's cn)
    val c = normalized(corpus, idCol, vecCol, "cand_id", "cv")
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    val centroids = trainCentroids(c, "cv", nCentroids, seed)
    val corpusCells = c.withColumn("cell", nearestCell(col("cv"), centroids))
      .select(col("cand_id"), col("cv"), col("cell"))

    // distance of each query to every centroid, keep nProbe nearest cells
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val cellDists = array(centroids.zipWithIndex.map { case (ctr, i) =>
      struct(sqDist(col("qv"), array(ctr.map(lit): _*)).as("d"),
        lit(i).as("cell"))
    }: _*)
    val probed = q
      .withColumn("probes",
        slice(array_sort(cellDists), 1, nProbe))
      .select(col("query_id"), col("qv"),
        explode(col("probes.cell")).as("cell"))

    rankTopK(corpusCells.join(broadcast(probed), "cell")
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", DotProduct(corpus.sparkSession, col("qv"), col("cv"))), k)
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥ threshold),
    * bucketed by a SINGLE SRP table. Small-data/teaching variant: with one
    * table the bucket count 2^nPlanes is fixed, so the per-bucket self-join
    * is ~N²/2^nPlanes — fine for bounded corpora, structurally quadratic as
    * N grows. The scale path is [[nearDupByCosineBanded]] /
    * [[nearDupByCosineAuto]], whose bucket count is sized to the corpus. */
  def nearDupByCosine(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, nPlanes: Int, dim: Int,
                      seed: Long = 42L): DataFrame = {
    val v = normalized(df, idCol, vecCol, "id", "v")
      .withColumn("bucket", srpBucket(df.sparkSession, col("v"), nPlanes, dim, seed))
    v.as("l").join(v.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("cos", DotProduct(df.sparkSession, col("l.v"), col("r.v")))
      .filter(col("cos") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("cos"))
  }

  // ---------------------------------------------------------------------
  // Multi-table (AND/OR-amplified) SRP near-dup — the 100 TB configuration
  // ---------------------------------------------------------------------

  /** Hyperplane count b sized so the expected bucket population
    * N / 2^b stays ≈ targetBucketRows as the corpus grows — the property
    * that keeps the per-bucket self-join linear in N instead of quadratic.
    * Floors at 4 (tiny corpora) and caps at 24 (16M buckets per table is
    * plenty before bucket-key cardinality itself stops being the issue). */
  def srpBitsFor(corpusRows: Long, targetBucketRows: Int = 64): Int = {
    require(corpusRows >= 0 && targetBucketRows > 0)
    val b = math.ceil(math.log(math.max(1.0,
      corpusRows.toDouble / targetBucketRows)) / math.log(2.0)).toInt
    math.min(24, math.max(4, b))
  }

  /** Table count L for a recall target: a pair at `threshold` cosine agrees
    * on one b-bit SRP sketch with probability p^b where
    * p = 1 − acos(threshold)/π (Goemans–Williamson), so L independent
    * tables catch it with 1 − (1 − p^b)^L ≥ targetRecall →
    * L = ln(1 − targetRecall) / ln(1 − p^b), capped at maxTables. The cap
    * matters in the low-similarity regime (threshold ≲ 0.7), where p^b
    * collapses and NO bucketing scheme stays sub-quadratic — near-dup
    * thresholds (≥ 0.8) keep L modest at any b. */
  def srpTablesFor(threshold: Double, bits: Int, targetRecall: Double = 0.9,
                   maxTables: Int = 32): Int = {
    require(threshold > -1.0 && threshold <= 1.0 && targetRecall > 0 && targetRecall < 1)
    val p = 1.0 - math.acos(math.min(1.0, threshold)) / math.Pi
    val pb = math.pow(p, bits)
    if (pb >= 1.0) 1
    else math.min(maxTables,
      math.max(1, math.ceil(math.log1p(-targetRecall) / math.log1p(-pb)).toInt))
  }

  /** Scale-safe embedding-cosine near-dup: L independent SRP tables of b
    * bits each (the same AND/OR amplification as MinHash banding —
    * AND within a table's b bits, OR across L tables).
    *
    * Shape, mirroring MinHashDedup: the bucket shuffle carries ONLY
    * (id, table, bucket) — never the vectors; candidate pairs are the
    * per-(table, bucket) self-equi-join, distinct'd, then verified by
    * joining the normalized vectors back BY ID and keeping cosine ≥
    * threshold. Bucket count 2^b per table scales with the corpus (pass
    * [[srpBitsFor]], or use [[nearDupByCosineAuto]]), so bucket population
    * — and with it the self-join cost — stays bounded at any N. */
  def nearDupByCosineBanded(df: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, dim: Int, nTables: Int,
                            bitsPerTable: Int, seed: Long = 42L): DataFrame = {
    require(nTables >= 1 && bitsPerTable >= 1 && bitsPerTable <= 24)
    // the normalized vectors feed bucket generation AND both verification
    // joins — persist the diamond's shared input once
    val v = normalized(df, idCol, vecCol, "id", "v")
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    // persist the (id, table, bucket) rows too: the candidate self-join
    // consumes them on BOTH sides, and whether the planner broadcasts one
    // side or sorts-merges, each side otherwise re-derives every
    // signature — N·L·b hyperplane dot products run twice (sf1 profiling
    // showed exactly that under a broadcast build). 24 bytes/row, the
    // cheapest frame in the query; same cache-lifetime contract as `v`
    val buckets = v.select(col("id"),
      posexplode(srpBucketsAll(col("v"), nTables, bitsPerTable, dim, seed)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    val pairs = buckets.as("l").join(buckets.as("r"),
        col("l.table") === col("r.table") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    pairs
      .join(v.select(col("id").as("id_a"), col("v").as("__va")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("__vb")), "id_b")
      .withColumn("cos", DotProduct(df.sparkSession, col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  // ---------------------------------------------------------------------
  // Int8-quantized scoring (IVFADC-style ADC: Jégou et al. 2011 quantize
  // the database side and score against it cheaply, rescoring exact)
  // ---------------------------------------------------------------------

  /** (<idAlias>, qv: array<tinyint>, scale: double) — symmetric per-vector
    * int8 quantization of the L2-normalized embedding: scale = max|v̂ᵢ|/127,
    * qᵢ = round(v̂ᵢ/scale). True int8 storage: 1 byte/component vs 8 for the
    * staged double — an 8× cut in the candidate-scoring working set, which
    * at 100 TB is the difference between a corpus that fits executor memory
    * and one that spills. û·v̂ ≈ (qᵤ·qᵥ)·scaleᵤ·scaleᵥ with |error| ≤
    * ~dim·(scaleᵤ+scaleᵥ)/254 — plenty to RANK candidates; exactness comes
    * from the rescore pass. */
  def quantized(df: DataFrame, idCol: String, vecCol: String,
                idAlias: String): DataFrame =
    withQuantized(normalized(df, idCol, vecCol, idAlias, "__nv"), "__nv")
      .select(col(idAlias), col("qv"), col("scale"))

  /** Append (qv, scale) derived from an ALREADY-normalized vector column —
    * a pure per-row projection, so callers that hold a normalized frame
    * never pay a second corpus pass (or a self-join) to quantize it. */
  private def withQuantized(df: DataFrame, nvCol: String): DataFrame =
    df.withColumn("__s", array_max(transform(col(nvCol), x => abs(x))) / 127.0)
      .withColumn("qv",
        when(col("__s") === 0.0,
          transform(col(nvCol), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col(nvCol),
            x => round(x / col("__s")).cast("tinyint"))))
      .withColumnRenamed("__s", "scale")

  /** Quantized-dot score: the codegen [[graft.functions.DotProduct]] loop
    * reads the array<tinyint> elements DIRECTLY (no cast-to-double array
    * materialized per row per pair — that allocation would dominate the
    * corpus×queries hot loop), then the two scales rescale. */
  private def qDot(spark: org.apache.spark.sql.SparkSession,
                   qa: Column, sa: Column, qb: Column, sb: Column): Column =
    DotProduct(spark, qa, qb) * sa * sb

  /** Top `rerank` (query_id, cand_id) per query by the coarse quantized
    * score — the shared shortlist step of both quantized paths. */
  private def coarseShortlist(coarse: DataFrame, rerank: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("qcos"), asc("cand_id"))
    coarse.withColumn("__r", row_number().over(w))
      .filter(col("__r") <= rerank)
      .select("query_id", "cand_id")
  }

  /** Brute-force top-k over int8-quantized vectors with exact rescoring:
    * phase 1 scores every (query, candidate) with the cheap quantized dot
    * and keeps `rerank ≥ k` candidates per query; phase 2 joins the exact
    * normalized vectors back BY ID for only those rerank·|queries| rows and
    * re-ranks by true cosine. The full-precision vectors never participate
    * in the corpus-wide scan — only in the tiny rescore join. Recall vs
    * [[bruteForceTopK]] is measured in AnnSpec. */
  def bruteForceTopKQuantized(corpus: DataFrame, queries: DataFrame,
                              idCol: String, vecCol: String, k: Int,
                              rerank: Int): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be ≥ k ($k)")
    val spark = corpus.sparkSession
    val qq = quantized(queries, idCol, vecCol, "query_id")
      .withColumnsRenamed(Map("qv" -> "qqv", "scale" -> "qs"))
    val cq = quantized(corpus, idCol, vecCol, "cand_id")
    val coarse = cq.join(broadcast(qq), col("query_id") =!= col("cand_id"))
      .withColumn("qcos", qDot(spark, col("qqv"), col("qs"), col("qv"), col("scale")))
    // exact rescore of the shortlist only; the corpus rescore side is a
    // second (deliberately uncached) scan — persisting the double vectors
    // would defeat the int8 working-set win
    rescoreExact(coarseShortlist(coarse, rerank),
      normalized(queries, idCol, vecCol, "query_id", "qvx"),
      normalized(corpus, idCol, vecCol, "cand_id", "cvx"), k)
  }

  /** IVF with int8 ADC scoring — the full IVFADC shape (Jégou et al. 2011):
    * k-means coarse quantizer restricts candidates to `nProbe` cells, the
    * in-cell scan scores QUANTIZED vectors (1 byte/component riding the
    * cell-probe join instead of 8), and only the per-query `rerank`
    * shortlist is rescored against the exact vectors by id-join. At 100 TB
    * this is the ANN configuration that actually ships: cells bound the
    * candidate count, int8 bounds the scan's memory bandwidth, and the
    * rescore join touches rerank·|queries| rows. Recall vs exact is
    * measured in AnnSpec. */
  def ivfTopKQuantized(corpus: DataFrame, queries: DataFrame, idCol: String,
                       vecCol: String, k: Int, nCentroids: Int, nProbe: Int,
                       rerank: Int, seed: Long = 42L): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be ≥ k ($k)")
    val spark = corpus.sparkSession

    // The normalized corpus feeds THREE consumers (quantizer sample, cell
    // assignment + quantization, exact rescore) — persist the diamond's
    // shared input once. Cache
    // contract as in DedupGroups: Verify/Bench clearCache per query;
    // long-lived callers should spark.catalog.clearCache() between
    // batches (or take bruteForceTopKQuantized, which deliberately
    // caches nothing).
    val cn = normalized(corpus, idCol, vecCol, "cand_id", "cv")
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    val centroids = trainCentroids(cn, "cv", nCentroids, seed)
    val corpusCells = withQuantized(cn, "cv")
      .withColumn("cell", nearestCell(col("cv"), centroids))
      .select(col("cand_id"), col("cell"), col("qv"), col("scale"))

    // the query pass likewise serves probing, coarse scoring, AND rescore
    val qn = withQuantized(
      normalized(queries, idCol, vecCol, "query_id", "qnv"), "qnv")
      .withColumnsRenamed(Map("qv" -> "qqv", "scale" -> "qs"))
    val cellDists = array(centroids.zipWithIndex.map { case (ctr, i) =>
      struct(sqDist(col("qnv"), array(ctr.map(lit): _*)).as("d"),
        lit(i).as("cell"))
    }: _*)
    val probed = qn
      .withColumn("probes", slice(array_sort(cellDists), 1, nProbe))
      .select(col("query_id"), col("qqv"), col("qs"),
        explode(col("probes.cell")).as("cell"))

    val coarse = corpusCells.join(broadcast(probed), "cell")
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("qcos", qDot(spark, col("qqv"), col("qs"), col("qv"), col("scale")))
    rescoreExact(coarseShortlist(coarse, rerank),
      qn.select(col("query_id"), col("qnv").as("qvx")),
      cn.select(col("cand_id"), col("cv").as("cvx")), k)
  }

  /** [[nearDupByCosineBanded]] with b sized from the actual corpus count and
    * L from the recall target — the configuration is a function of the data,
    * not a constant, which is what makes the plan survive a 100× scale-up.
    * Costs one extra count() job (a metadata-only pass on parquet).
    *
    * The L-cap handoff: b grows with the corpus (to hold per-bucket
    * occupancy), and as p^b collapses the table count L needed to hold
    * `targetRecall` grows too — once the UNCAPPED L passes `maxTables`,
    * the SRP configuration can no longer buy the recall target, and
    * continuing to run it pays N·occupancy·L candidate volume for recall
    * it silently fails to deliver. Past that boundary the operator
    * DELEGATES (loud stderr note) to [[semanticNearDup]], the
    * O(N·maxCells·dim) self-sharding density path whose cost does not
    * ride the recall→tables curve; exact (bit-equal) duplicate pairs are
    * still always found (identical vectors share a cell), near-misses
    * move to the documented cell-boundary class. A corpus big enough to
    * trip the cap should really stage [[srpIndex]] once and probe it
    * incrementally ([[incrementalCosineDups]]) — the delegation keeps
    * the one-shot call safe; `delegatePastCap = false` pins the old
    * capped-SRP behavior (run at maxTables, accept the recall shortfall)
    * for callers that want the SRP pair profile regardless.
    * AnnSpec pins delegation engagement, exact-duplicate recall parity
    * on the delegated path, and the non-delegated regime's invariance. */
  def nearDupByCosineAuto(df: DataFrame, idCol: String, vecCol: String,
                          threshold: Double, dim: Int,
                          targetRecall: Double = 0.9,
                          targetBucketRows: Int = 64,
                          maxTables: Int = 32, seed: Long = 42L,
                          delegatePastCap: Boolean = true): DataFrame = {
    val bits = srpBitsFor(df.count(), targetBucketRows)
    val uncapped = srpTablesFor(threshold, bits, targetRecall, Int.MaxValue)
    if (delegatePastCap && uncapped > maxTables) {
      System.err.println(
        s"NOTE nearDupByCosineAuto: holding recall $targetRecall at " +
          s"b=$bits would need L=$uncapped SRP tables (> maxTables=" +
          s"$maxTables) — past the cap-sizing regime; delegating to " +
          "semanticNearDup (self-sharding density cells). Stage srpIndex " +
          "+ incrementalCosineDups for the persistent-corpus workflow.")
      semanticNearDup(df, idCol, vecCol, threshold, seed = seed)
        .select("id_a", "id_b", "cos")
    } else {
      val tables = math.min(uncapped, maxTables)
      nearDupByCosineBanded(df, idCol, vecCol, threshold, dim, tables, bits,
        seed)
    }
  }

  /** Persisted SRP bucket index of an embedding corpus: (id, table, bucket)
    * rows, written once at corpus build and appended per ingest — the
    * embedding analog of [[graft.dedup.MinHashDedup.bandIndex]]. Pair with
    * [[normalizedVectors]] (the cosine-confirm side) and feed both to
    * [[incrementalCosineDups]]; the 100 TB of historical embeddings is then
    * never re-projected at ingest time. */
  def srpIndex(df: DataFrame, idCol: String, vecCol: String, dim: Int,
               nTables: Int, bitsPerTable: Int, seed: Long = 42L): DataFrame = {
    require(nTables >= 1 && bitsPerTable >= 1 && bitsPerTable <= 24)
    normalized(df, idCol, vecCol, "id", "v").select(col("id"),
        posexplode(srpBucketsAll(col("v"), nTables, bitsPerTable, dim, seed)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
  }

  /** (id, v): L2-normalized vectors — the persisted confirm-side companion
    * of [[srpIndex]]. */
  def normalizedVectors(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    normalized(df, idCol, vecCol, "id", "v")

  /** Incremental embedding near-dup: today's ingest against an already-
    * indexed corpus, the cosine twin of
    * [[graft.dedup.MinHashDedup.incrementalNearDups]]. The historical
    * corpus participates ONLY through its persisted [[srpIndex]] and
    * [[normalizedVectors]] tables — raw historical embeddings are never
    * re-read or re-projected. The increment's bucket rows BROADCAST onto
    * the corpus index scan (a daily batch is tiny against the corpus; the
    * index is probed in place, never shuffled), candidate id pairs —
    * bounded by true near-dups plus SRP collisions — broadcast onto the
    * vector table for exact-cosine confirmation, and within-increment
    * pairs come from the ordinary self-join on the increment alone.
    *
    * The pair broadcast is GUARDED (the q18 DF-cap philosophy applied
    * to joins): candidates are persisted and counted first — one scan
    * of a cached two-long frame the confirm join needs anyway — and
    * only a set of ≤ `maxBroadcastPairs` is broadcast-hinted; a
    * pathological threshold/bucket config that explodes collisions past
    * the cap falls back to an AQE-decided shuffle join instead of
    * blowing the driver's broadcast ceiling. Rows are identical on both
    * paths (the hint is strategy, not semantics; AnnSpec pins this).
    *
    * Output: (new_id, dup_id, cos) — `dup_id` an indexed corpus id or an
    * earlier (lower-id) id of the same increment. Contract: globally
    * unique ids, and the index was built with the same
    * (dim, nTables, bitsPerTable, seed). */
  def incrementalCosineDups(newDocs: DataFrame, idCol: String, vecCol: String,
                            corpusIndex: DataFrame, corpusVecs: DataFrame,
                            threshold: Double, dim: Int, nTables: Int,
                            bitsPerTable: Int, seed: Long = 42L,
                            maxBroadcastPairs: Long = 4000000L): DataFrame = {
    val newV = normalized(newDocs, idCol, vecCol, "id", "v")
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    val newBuckets = newV.select(col("id").as("new_id"),
        posexplode(srpBucketsAll(col("v"), nTables, bitsPerTable, dim, seed)))
      .withColumnsRenamed(Map("pos" -> "table", "col" -> "bucket"))
    val cross = corpusIndex
      .join(broadcast(newBuckets), Seq("table", "bucket"))
      .select(col("id").as("id_a"), col("new_id").as("id_b"))
      .distinct()
    val within = newBuckets.as("l").join(newBuckets.as("r"),
        col("l.table") === col("r.table") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.new_id") < col("r.new_id"))
      .select(col("l.new_id").as("id_a"), col("r.new_id").as("id_b"))
      .distinct()
    val candidates = cross.union(within).distinct()
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    val pairs =
      if (candidates.count() <= maxBroadcastPairs) broadcast(candidates)
      else candidates
    val vecs = corpusVecs.select("id", "v").union(newV.select("id", "v"))
    // materialize the (small, threshold-filtered) result eagerly, then
    // RELEASE the iteration caches — the LinkGraph cache-lifetime rule:
    // without this every invocation pins its normalized-increment and
    // candidate frames for the session's lifetime
    val out = pairs
      .join(vecs.select(col("id").as("id_a"), col("v").as("__va")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("__vb")), "id_b")
      .withColumn("cos", DotProduct(newDocs.sparkSession, col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_b").as("new_id"), col("id_a").as("dup_id"), col("cos"))
      .localCheckpoint()
    candidates.unpersist()
    newV.unpersist()
    out
  }

  /** SemDeDup-style semantic near-dup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means coarse cells cluster the corpus; candidate pairs are generated
    * WITHIN cells only, then cosine-verified by id-join — the same
    * bucket-join-never-all-pairs shape as [[nearDupByCosineBanded]], with
    * data-adaptive buckets instead of random hyperplanes.
    *
    * Trade vs SRP tables, stated honestly: k-means cells follow data
    * DENSITY, so semantically clustered near-dups land together with far
    * higher probability than under random projections at the same bucket
    * count — but there is no OR-amplification, and a pair straddling a cell
    * boundary is missed BY DESIGN (the paper accepts exactly this). Use the
    * SRP paths when a recall target must be engineered; use this when
    * cluster structure is the point (it also yields the cluster ids a
    * curation pass reuses for diversity sampling).
    *
    * Scale — the operator shards ITSELF; no caller orchestration: cell
    * count kTotal = N / targetCellRows tracks the corpus (the property
    * that keeps per-cell occupancy — and the within-cell self-join —
    * bounded at any N), while `maxCells` bounds any SINGLE quantizer.
    * Past kTotal ≤ maxCells the corpus pre-partitions into
    * 2^⌈log₂(kTotal/maxCells)⌉ shards by an SRP bit-prefix (the paper's
    * own per-shard clustering regime, keyed by locality-preserving
    * hyperplane signs rather than an arbitrary split), and each shard
    * fits its own ≤ maxCells quantizer INSIDE ONE EXECUTOR TASK
    * (`flatMapGroups`): a shard is ~maxCells·targetCellRows rows by
    * construction (default 16K rows ≈ 8 MB at 64 dims), so the fit is
    * local math — no driver collect, no per-shard Spark jobs, no
    * centroid-literal expression growth. Total work is
    * O(N · maxCells · dim) at ANY corpus size; no stage is ever
    * quadratic in N.
    *
    * Sharded-regime honesty: (a) a near-dup pair straddling an SRP
    * prefix boundary is missed with probability 1 − pᵇ per pair,
    * p = 1 − acos(cos)/π — ≈ 0 for exact/near-exact duplicates (a pair
    * at cosine 1 NEVER splits: identical vectors project identically),
    * the same accepted-miss class as the cell boundary itself; (b) shard
    * population is a binomial around N/2^b only if the corpus is not
    * directionally degenerate — a corpus collapsed into one narrow cone
    * concentrates rows into one SRP shard. That regime is guarded: a
    * count pass prices every shard, and any shard past 8× its design
    * population is salted by NORMALIZED-VECTOR hash into bounded
    * sub-shards (bit-equal duplicates share a hash, so exact-duplicate
    * pairs still never split; near-equal pairs may, joining the
    * boundary-miss class) — memory stays bounded at any skew instead of
    * one task buffering the corpus. Below the cap the single-quantizer
    * path is the exact pre-sharding operator (AnnSpec pins
    * sharded/unsharded pair-set parity on planted duplicates,
    * sharded-path recall, and the salted-regime guard).
    *
    * Output: (id_a, id_b, cell, cos) — `cell` is the GLOBAL cell id
    * (shard · maxCells + local cell, a long), the diversity-sampling
    * hook. Cell ids are deterministic under a fixed seed (per-shard rows
    * sort before the seeded fit). */
  def semanticNearDup(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, targetCellRows: Int = 256,
                      maxCells: Int = 64, seed: Long = 42L): DataFrame = {
    require(targetCellRows >= 1 && maxCells >= 4)
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val v = normalized(df, idCol, vecCol, "id", "v")
      .localCheckpoint() // eager materialize — the Guards.materialize
      // rationale: lazy caches are raced into recomputes by concurrent
      // AQE stage jobs, and cached plans freeze out AQE coalescing
    val n = v.count()
    val kTotal = math.max(4L, (n + targetCellRows - 1) / targetCellRows)
    val nShards = ((kTotal + maxCells - 1) / maxCells).toInt
    // the cell shuffle carries (id, cell) only — vectors rejoin BY ID
    val cells: DataFrame =
      if (nShards <= 1) {
        // below the cap: one bounded driver-sampled quantizer, one codegen
        // argmin pass — the original single-quantizer operator
        val centroids = trainCentroids(v, "v", kTotal.toInt, seed)
        v.withColumn("cell",
            nearestCell(col("v"), centroids).cast("long"))
          .select("id", "cell")
      } else {
        val shardBits = 32 - Integer.numberOfLeadingZeros(nShards - 1)
        val dim = v.select(size(col("v"))).head().getInt(0)
        val outSchema = StructType(Seq(v.schema("id"),
          StructField("cell", LongType, nullable = false)))
        // offset the shard seed so shard planes never coincide with a
        // caller's other SRP structures built from the same base seed
        val bySrp = v.withColumn("shard",
          srpBucket(spark, col("v"), shardBits, dim, seed + 7919))
        // Shard-size guard: one map-side-combined count pass (over the
        // already-persisted normalized frame) prices every shard before
        // anything buffers. A directionally DEGENERATE corpus — all
        // vectors in one narrow cone — concentrates every row into one
        // SRP shard, and the per-shard flatMapGroups below would buffer
        // the whole corpus in a single task. Oversized shards (> 8× the
        // ~targetCellRows·maxCells design population) are salted by a
        // hash of the NORMALIZED VECTOR into ⌈rows/cap⌉ sub-shards, each
        // fitting its own quantizer: memory stays bounded at any skew.
        // Vector-hash (not id-hash) salting keeps bit-identical
        // duplicates in one sub-shard — cos-1 pairs of EQUAL vectors
        // still never split; near-identical-but-not-equal pairs split
        // with ≈ (nSalt−1)/nSalt probability in this regime, joining the
        // documented boundary-miss class (degrade recall, never OOM).
        // Mass-duplicated VALUES concentrating in that one sub-shard are
        // bounded separately: cells0 interns duplicate vectors, so the
        // buffered footprint there is distinct-vectors-sized, and the
        // distinct-vector population is what this salt math spreads.
        val shardCap = 8L * targetCellRows * maxCells
        val nSaltByShard = bySrp.groupBy("shard")
          .agg(count(lit(1)).as("__rows"))
          .select(col("shard"),
            ceil(col("__rows").cast("double") / shardCap)
              .cast("long").as("__nsalt"))
        val maxSalt = math.max(1L,
          nSaltByShard.agg(max("__nsalt")).head().getLong(0))
        require(nShards.toLong * maxSalt <= Long.MaxValue / maxCells,
          s"cell-id space overflow: $nShards shards × $maxSalt salts × $maxCells cells")
        // gkey == shard when no shard is oversized (maxSalt = 1, salt 0):
        // the unsalted regime is bit-for-bit the pre-guard operator —
        // same group keys, same per-group seeds, same cell ids
        val sharded =
          if (maxSalt == 1L)
            bySrp.withColumn("gkey", col("shard").cast("long"))
          else
            bySrp.join(nSaltByShard, "shard")
              .withColumn("gkey", col("shard").cast("long") * maxSalt +
                pmod(xxhash64(col("v")), col("__nsalt")))
        val idIdx = sharded.schema.fieldIndex("id")
        val vIdx = sharded.schema.fieldIndex("v")
        val gkeyIdx = sharded.schema.fieldIndex("gkey")
        val (tcr, mc, sd) = (targetCellRows, maxCells, seed)
        cells0(sharded, idIdx, vIdx, gkeyIdx, tcr, mc, sd, outSchema)
      }
    val pairs = cells.as("l").join(cells.as("r"),
        col("l.cell") === col("r.cell") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.cell").as("cell"))
    pairs
      .join(v.select(col("id").as("id_a"), col("v").as("__va")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("__vb")), "id_b")
      .withColumn("cos", DotProduct(df.sparkSession, col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cell", "cos")
  }

  /** The sharded-regime (id, global cell) assignment of [[semanticNearDup]]:
    * one shuffle keyed by `gkey` (SRP shard, salted past the size cap —
    * gkey == shard in the unsalted regime); per group, an executor-local
    * k-means++/Lloyd fit ([[localKMeans]], trained on a ≤ k·256 stride
    * sample of the shard's id-sorted rows for determinism) assigns every
    * row its cell. Null vectors drop here — under the codegen path their
    * null cell never equi-joins, the same net exclusion. */
  private def cells0(sharded: DataFrame, idIdx: Int, vIdx: Int,
                     gkeyIdx: Int, targetCellRows: Int, maxCells: Int,
                     seed: Long,
                     outSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    sharded.groupByKey(_.getLong(gkeyIdx))(Encoders.scalaLong)
      .flatMapGroups { (gkey: Long, it: Iterator[Row]) =>
        // Vector interning: vector-hash salting deliberately keeps
        // bit-identical duplicates in ONE sub-shard (equal vectors must
        // share a cell), so a mass-duplicated corpus — the most common
        // real skew in a dedup workload — concentrates every copy here
        // no matter the salt count. Duplicates share one array instance:
        // the buffered footprint is O(ids + DISTINCT vectors × dim), not
        // O(rows × dim), and the training sample / assignments see the
        // same values row-for-row (bit-identical output, storage only).
        val intern = new java.util.HashMap[Seq[Double], Array[Double]]()
        val rows = it.flatMap { r =>
          val vec = if (r.isNullAt(vIdx)) null else r.getSeq[Double](vIdx)
          if (vec == null) None
          else {
            var arr = intern.get(vec)
            if (arr == null) { arr = vec.toArray; intern.put(vec, arr) }
            Some((r.get(idIdx), arr))
          }
        }.toArray.sortBy(_._1.toString)
        if (rows.isEmpty) Iterator.empty
        else {
          val k = math.min(maxCells.toLong, math.max(4L,
            (rows.length.toLong + targetCellRows - 1) / targetCellRows)).toInt
          val cap = k * 256
          val trainPts =
            if (rows.length <= cap) rows.map(_._2)
            else {
              val stride = rows.length.toDouble / cap
              Array.tabulate(cap)(i => rows((i * stride).toInt)._2)
            }
          val ctrs = localKMeans(trainPts, k, seed + gkey)
          val base = gkey * maxCells
          rows.iterator.map { case (id, vec) =>
            Row(id, base + nearestLocal(vec, ctrs)) }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }
}
