package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.similarity.Ann
import graft.sources.Tables

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private def localCosine(u: Seq[Float], v: Seq[Float]): Double = {
    val dot = u.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
    val nu = math.sqrt(u.map(x => x.toDouble * x.toDouble).sum)
    val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    dot / (nu * nv)
  }

  test("vector functions match local math") {
    val u = Seq(1.0f, 2.0f, 3.0f)
    val v = Seq(-1.0f, 0.5f, 2.0f)
    val row = Seq((u, v)).toDF("u", "v")
      .select(VectorFunctions.dot(col("u"), col("v")).as("d"),
        VectorFunctions.l2Norm(col("u")).as("n"),
        VectorFunctions.cosine(col("u"), col("v")).as("c"),
        VectorFunctions.sqDist(col("u"), col("v")).as("s"))
      .head()
    assert(math.abs(row.getDouble(0) - 6.0) < 1e-9)
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < 1e-9)
    assert(math.abs(row.getDouble(2) - localCosine(u, v)) < 1e-9)
    assert(math.abs(row.getDouble(3) - (4.0 + 2.25 + 1.0)) < 1e-9)
  }

  test("bruteForceTopK matches a locally computed exact top-k") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 3)
    val got = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq).toMap

    val local = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val qids = local.keys.filter(_ < 3)
    qids.foreach { q =>
      val expect = local.filter(_._1 != q).toSeq
        .map { case (id, v) => (id, localCosine(local(q), v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1)
      assert(got(q) == expect, s"query $q: ${got(q)} != $expect")
    }
  }

  test("bruteForceTopK count-then-cap: an over-cap query set degrades to " +
    "a shuffled plan with identical rows (no driver broadcast)") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 3)
    def rows(cap: Long) =
      Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 3, cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows(0L) == rows(1000000L))
    // the broadcast hint is absent past the cap — the planner, not the
    // operator, decides the exchange (AQE demotes/promotes at runtime)
    val lp = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 3, 0L)
      .queryExecution.analyzed.toString
    assert(!lp.contains("ResolvedHint"), lp)
  }

  test("hardNegativesTopK: same-label twins excluded, never crowd the top-k") {
    // anchor 1 (label 0): id 2 is a same-label NEAR-TWIN (most similar of
    // all), ids 3/4 are different-label and less similar. The twin must
    // not appear, and must not push 3/4 out of a k=2 list.
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f), 0),
      (2L, Seq(0.99f, 0.01f, 0.0f), 0),   // same label, cos ≈ 1
      (3L, Seq(0.9f, 0.1f, 0.0f), 1),
      (4L, Seq(0.8f, 0.2f, 0.0f), 2),
      (5L, Seq(0.0f, 1.0f, 0.0f), 0)
    ).toDF("id", "vec", "label")
    val got = Ann.hardNegativesTopK(df, df.filter(col("id") === 1L),
      "id", "vec", "label", k = 2).collect()
      .map(r => (r.getInt(2), r.getLong(1))).toMap
    assert(got == Map(1 -> 3L, 2 -> 4L), s"got $got")
  }

  test("hardNegativesTopK equals bruteForceTopK when every label differs") {
    val emb = Tables.embeddings(spark, sfDir)
      .withColumn("ulabel", col("vec_id")) // unique labels: only self excluded
    val queries = emb.filter(col("vec_id") < 3)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val hard = asMap(Ann.hardNegativesTopK(emb, queries, "vec_id",
      "embedding", "ulabel", k = 3))
    val brute = asMap(Ann.bruteForceTopK(emb, queries, "vec_id",
      "embedding", k = 3))
    assert(hard == brute)
  }

  test("hardNegativesTopK output never pairs equal labels") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
    val out = Ann.hardNegativesTopK(emb, queries, "vec_id", "embedding",
      "label", k = 5)
    val labels = emb.select(col("vec_id"), col("label"))
    val samePairs = out
      .join(labels.select(col("vec_id").as("query_id"), col("label").as("ql")),
        "query_id")
      .join(labels.select(col("vec_id").as("cand_id"), col("label").as("cl")),
        "cand_id")
      .filter(col("ql") === col("cl")).count()
    assert(samePairs == 0)
  }

  test("lshTopK recall vs brute force is usable") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, queries, "vec_id", "embedding", 5,
      nPlanes = 2, dim = 64).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall too low even for 2-plane LSH")
    // scale contract: bucketed path never degenerates to all-pairs
    assertNoCartesian(Ann.lshTopK(emb, queries, "vec_id", "embedding", 5, 2, 64))
  }

  test("TopKAggregator path equals the window-sort path exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 10)
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val win = asMap(Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5))
    val agg = asMap(Ann.bruteForceTopKAgg(emb, queries, "vec_id", "embedding", 5))
    assert(win == agg, s"win=${win.size} agg=${agg.size}")
    // and the aggregator plan has partial aggregation before the exchange
    val plan = Ann.bruteForceTopKAgg(emb, queries, "vec_id", "embedding", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "aggregator path should not window-sort")
  }

  test("ivfTopK recall vs brute force beats single-cell probing") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val got = Ann.ivfTopK(emb, queries, "vec_id", "embedding", 5,
        nCentroids = 8, nProbe = nProbe).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & got).size.toDouble / exact.size
    }
    val r1 = recallAt(1)
    val r4 = recallAt(4)
    assert(r4 >= r1, s"recall did not improve with more probes: $r1 -> $r4")
    assert(r4 >= 0.5, s"recall@4-of-8-cells $r4 too low")
  }

  test("zero vectors never rank as top matches (no NaN cosine)") {
    val zero = Seq.fill(64)(0.0f)
    val base = (0 until 64).map(i => math.sin(i).toFloat)
    val near = base.updated(1, base(1) + 0.02f)
    val df = Seq((1L, base), (2L, near), (3L, zero)).toDF("id", "vec")
    val top = Ann.bruteForceTopK(df, df.filter(col("id") === 1L), "id", "vec", 1)
      .head()
    assert(top.getLong(1) == 2L, s"zero vector outranked the real neighbor: $top")
    assert(!top.getDouble(3).isNaN)
  }

  test("srpBitsFor keeps expected bucket population bounded as N grows") {
    assert(Ann.srpBitsFor(500) == 4)           // small-corpus floor
    assert(Ann.srpBitsFor(1000000) == 14)      // 1e6/64 -> 2^14 buckets
    assert(Ann.srpBitsFor(1000000000L) == 24)  // cap
    // the scale contract: N/2^b (expected rows per bucket) stays ~constant
    // across a 10^6x corpus growth instead of growing linearly like a
    // fixed-bucket config
    Seq(1000L, 100000L, 10000000L, 1000000000L).foreach { n =>
      val b = Ann.srpBitsFor(n, targetBucketRows = 64)
      val pop = n.toDouble / math.pow(2.0, b)
      assert(pop <= 64.0 || b == 24, s"n=$n b=$b pop=$pop")
    }
    // monotone: more data never means fewer buckets
    val bits = Seq(100L, 10000L, 1000000L, 100000000L).map(Ann.srpBitsFor(_))
    assert(bits == bits.sorted)
  }

  test("marginMining: the planted translation pair beats the hub vector " +
    "that raw cosine would rank close everywhere") {
    val src = Seq(
      (0L, 0, Array(1f, 0f, 0f, 0f)),
      (10L, 0, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "label", "embedding")
    val tgt = Seq(
      (1L, 1, Array(0.99f, 0.1f, 0f, 0f)),    // translation of vec 0
      (3L, 1, Array(0.5f, 0.5f, 0.5f, 0.5f)), // hub: mid-cos to everything
      (5L, 1, Array(0f, 0f, 1f, 0f)),
      (7L, 1, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "label", "embedding")
    val got = Ann.marginMining(src, tgt, "vec_id", "embedding", k = 2)
      .as[(Long, Long, Long, Long)].collect()
    val m = got.map(r => (r._1, r._2) -> r._4).toMap
    assert(m.contains((0L, 1L)), s"true pair missing: $m")
    assert(m((0L, 1L)) > 1000000L,
      s"true pair must beat its neighborhoods: $m")
    val hubMargins = got.filter(_._2 == 3L).map(_._4)
    assert(hubMargins.nonEmpty && hubMargins.forall(_ < m((0L, 1L))),
      s"hub pairings must score below the true pair: $m")
  }

  test("banded multi-table SRP: high recall on planted near-dups, no all-pairs") {
    // plant near-duplicates: scaled+shifted copies of 40 real embeddings
    // (cosine vs the original ≈ 0.99+); ground truth from local exact math
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 40)
      .select("vec_id", "embedding")
    val planted = base.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"),
        x => (x * lit(1.05) + lit(0.01)).cast("float")).as("embedding"))
    val corpus = base.unionByName(planted)
    val threshold = 0.95
    val local = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // Seq comprehension: a Map comprehension would keep one pair per ia
    val expect = (for {
      (ia, va) <- local.toSeq; (ib, vb) <- local.toSeq
      if ia < ib && localCosine(va, vb) >= threshold
    } yield (ia, ib)).toSet
    assert(expect.size >= 40, s"planting failed: only ${expect.size} true pairs")

    val out = Ann.nearDupByCosineAuto(corpus, "vec_id", "embedding",
      threshold, dim = 64)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (expect & got).size.toDouble / expect.size
    assert(recall >= 0.85, s"recall $recall below auto-config target")
    // precision is exact by construction (cosine-verified) — every emitted
    // pair must be a true pair
    assert((got -- expect).isEmpty, s"unverified pairs leaked: ${got -- expect}")
    assertNoCartesian(out)
  }

  test("banded SRP verification join carries ids, not vectors, to the buckets") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.nearDupByCosineBanded(emb, "vec_id", "embedding",
      threshold = 0.3, dim = 64, nTables = 4, bitsPerTable = 4)
    assertNoCartesian(out)
    // more tables can only add candidate pairs (OR-amplification), and every
    // result is still cosine-verified
    val few = Ann.nearDupByCosineBanded(emb, "vec_id", "embedding",
      0.3, 64, nTables = 2, bitsPerTable = 4).count()
    val more = Ann.nearDupByCosineBanded(emb, "vec_id", "embedding",
      0.3, 64, nTables = 8, bitsPerTable = 4).count()
    assert(more >= few, s"recall did not grow with tables: $few -> $more")
  }

  test("int8 quantization: tinyint storage, high recall after exact rescore") {
    val emb = Tables.embeddings(spark, sfDir)
    // storage really is int8: the quantized column is array<tinyint>
    val q = Ann.quantized(emb, "vec_id", "embedding", "id")
    assert(q.schema("qv").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false) ||
      q.schema("qv").dataType.simpleString == "array<tinyint>")
    // every quantized component is within int8 by construction
    val mx = q.select(max(array_max(transform(col("qv"),
      x => abs(x.cast("int"))))).as("m")).head().getInt(0)
    assert(mx <= 127)

    val queries = emb.filter(col("vec_id") < 8)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Ann.bruteForceTopKQuantized(emb, queries, "vec_id",
      "embedding", k = 5, rerank = 32)
    val got = quant.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.9, s"quantized recall $recall below target")
    // emitted cosines are the EXACT rescored values: spot-check one pair
    val row = quant.head()
    val local = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id").isin(row.getLong(0), row.getLong(1)))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(math.abs(row.getDouble(3) -
      localCosine(local(row.getLong(0)), local(row.getLong(1)))) < 1e-9)
  }

  test("quantized IVF (IVFADC shape): recall beats cells-only loss budget") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Ann.ivfTopKQuantized(emb, queries, "vec_id", "embedding",
        k = 5, nCentroids = 4, nProbe = 3, rerank = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // loss comes from the probe (cells-only), not the int8 scan: with the
    // same cells/probes the plain IVF recall is the ceiling — quantized
    // must land within one result of it
    val ivf = Ann.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nCentroids = 4, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfRecall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= ivfRecall - 0.05,
      s"int8 scan lost recall beyond quantization noise: $recall vs $ivfRecall")
    assert(recall >= 0.6, s"quantized IVF recall $recall unusable")
  }

  test("nearDupByCosine finds planted duplicate vectors, bucketed plan") {
    val base = (0 until 64).map(i => math.sin(i).toFloat)
    val near = base.updated(0, base(0) + 0.01f)
    val far = (0 until 64).map(i => math.cos(3 * i).toFloat)
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "vec")
    val out = Ann.nearDupByCosine(df, "id", "vec", threshold = 0.99,
      nPlanes = 2, dim = 64)
    val ids = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)), s"planted dup missed: $ids")
    assert(!ids.contains((1L, 3L)) && !ids.contains((2L, 3L)))
    assertNoCartesian(out)
  }

  test("incrementalCosineDups: corpus via index only, planted dups found") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 60)
      .select("vec_id", "embedding")
    // persisted index + vector table: the only corpus-side inputs below
    val idx = Ann.srpIndex(base, "vec_id", "embedding", dim = 64,
      nTables = 6, bitsPerTable = 6)
    val vecs = Ann.normalizedVectors(base, "vec_id", "embedding")
    // increment: near-copies of corpus vecs 0..9 (ids 1000+i), plus an
    // exact within-increment dup pair (2000, 2001 share vec 30's copy)
    val copies = base.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000L).as("vec_id"),
        transform(col("embedding"),
          x => (x * lit(1.05) + lit(0.01)).cast("float")).as("embedding"))
    val pairSrc = base.filter(col("vec_id") === 30)
    val inc = copies
      .unionByName(pairSrc.select(lit(2000L).as("vec_id"), col("embedding")))
      .unionByName(pairSrc.select(lit(2001L).as("vec_id"), col("embedding")))
    val threshold = 0.95
    val out = Ann.incrementalCosineDups(inc, "vec_id", "embedding", idx, vecs,
      threshold, dim = 64, nTables = 6, bitsPerTable = 6)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ground truth from local exact math over corpus ∪ increment
    val local = (base.collect() ++ inc.collect())
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // comprehend over a Seq, not the Map: a Map comprehension yields a Map
    // keyed on ib, silently collapsing multiple true pairs per increment id
    val expect = (for {
      (ib, vb) <- local.toSeq; if ib >= 1000L // only increment docs emit
      (ia, va) <- local.toSeq; if ia < ib && localCosine(va, vb) >= threshold
    } yield (ib, ia)).toSet
    assert(expect.size >= 12, s"planting failed: ${expect.size} true pairs")
    // precision exact (cosine-verified); recall per SRP amplification
    assert((got -- expect).isEmpty, s"unverified pairs: ${got -- expect}")
    val recall = (expect & got).size.toDouble / expect.size
    assert(recall >= 0.9, s"incremental recall $recall below target")
    // the known plants are individually present
    assert(got.contains((2001L, 2000L)), "within-increment dup missed")
    assert((0 until 10).forall(i => got.contains((1000L + i, i.toLong))),
      s"cross plants missing: $got")
    assertNoCartesian(out)
  }

  test("incrementalCosineDups: past the pair-broadcast cap the confirm " +
    "join falls back to a shuffle join with identical rows") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 40)
      .select("vec_id", "embedding")
    val idx = Ann.srpIndex(base, "vec_id", "embedding", dim = 64,
      nTables = 6, bitsPerTable = 6)
    val vecs = Ann.normalizedVectors(base, "vec_id", "embedding")
    val inc = base.filter(col("vec_id") < 8)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
    def run(cap: Long) = Ann.incrementalCosineDups(
      inc, "vec_id", "embedding", idx, vecs, 0.95,
      dim = 64, nTables = 6, bitsPerTable = 6, maxBroadcastPairs = cap)
    val viaBroadcast = run(Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaShuffle = run(0L)  // cap 0: every candidate set overflows
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaShuffle == viaBroadcast && viaShuffle.nonEmpty,
      s"fallback rows drifted: $viaShuffle vs $viaBroadcast")
    assertNoCartesian(run(0L))
  }

  test("semanticNearDup: planted near-dups recovered within cells, verified") {
    // same planting as the banded SRP test: scaled+shifted copies sit at
    // cosine ≈ 0.99+ of their original — close enough that a density-
    // following quantizer must put each copy in its original's cell
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 40)
      .select("vec_id", "embedding")
    val planted = base.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"),
        x => (x * lit(1.05) + lit(0.01)).cast("float")).as("embedding"))
    val corpus = base.unionByName(planted)
    val threshold = 0.95
    val local = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // Seq comprehension: a Map comprehension would keep one pair per ia
    val expect = (for {
      (ia, va) <- local.toSeq; (ib, vb) <- local.toSeq
      if ia < ib && localCosine(va, vb) >= threshold
    } yield (ia, ib)).toSet
    assert(expect.size >= 40, s"planting failed: only ${expect.size} true pairs")

    val out = Ann.semanticNearDup(corpus, "vec_id", "embedding", threshold,
      targetCellRows = 16)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (expect & got).size.toDouble / expect.size
    assert(recall >= 0.85, s"within-cell recall $recall below target")
    // precision exact by construction: every pair is cosine-verified
    assert((got -- expect).isEmpty, s"unverified pairs leaked: ${got -- expect}")
    assertNoCartesian(out)
  }

  test("semanticNearDup: cell count follows the corpus, cells ride the output") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Ann.semanticNearDup(emb, "vec_id", "embedding",
      threshold = 0.5, targetCellRows = 64)
    assert(out.columns.toSeq == Seq("id_a", "id_b", "cell", "cos"))
    assertNoCartesian(out)
    // pairs within one cell carry that cell id (the diversity-sampling hook)
    val byCell = out.collect()
    byCell.foreach(r => assert(r.getLong(2) >= 0L))
  }

  test("semanticNearDup: sharded and unsharded regimes agree pair-for-pair " +
    "on planted exact duplicates") {
    // exact copies sit at cosine 1.0: they share every SRP sign bit (same
    // shard, deterministically) and every quantizer puts identical vectors
    // in one cell — so at a threshold only exact copies clear, BOTH
    // regimes must emit exactly the planted pair set
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 96)
      .select("vec_id", "embedding")
    val corpus = base.unionByName(
      base.select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    val expect = (0L until 96L).map(i => (i, i + 1000L)).toSet
    def run(maxCells: Int) =
      Ann.semanticNearDup(corpus, "vec_id", "embedding", threshold = 0.9999,
        targetCellRows = 8, maxCells = maxCells)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 192 rows / 8 per cell = 24 total cells: maxCells=24 → one quantizer;
    // maxCells=8 → 3→4 shards, the flatMapGroups executor-side regime
    val unsharded = run(24)
    val sharded = run(8)
    assert(unsharded == expect, s"unsharded drifted: $unsharded")
    assert(sharded == expect, s"sharded drifted: $sharded")
  }

  test("semanticNearDup sharded regime survives total directional skew " +
    "(every vector identical → one shard, one cell, all pairs found)") {
    // the documented worst case for SRP pre-partitioning: a corpus
    // collapsed to a single direction concentrates EVERY row into one
    // shard — the per-shard fit must still run (bounded here by the
    // train-sample cap) and emit the complete pair set
    val n = 200
    val one = Seq.tabulate(64)(i => (0.1f * ((i % 7) + 1)))
    val corpus = (0L until n.toLong).map(i => (i, one)).toDF("vec_id", "embedding")
    val out = Ann.semanticNearDup(corpus, "vec_id", "embedding",
      threshold = 0.999, targetCellRows = 8, maxCells = 4)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for (a <- 0L until n.toLong; b <- (a + 1) until n.toLong)
      yield (a, b)).toSet
    assert(got == expect, s"skewed corpus lost pairs: got ${got.size} of " +
      s"${expect.size}")
  }

  test("semanticNearDup sharded regime: planted near-dup recall, exact " +
    "precision, global cell ids, deterministic re-run") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 80)
      .select("vec_id", "embedding")
    val planted = base.select((col("vec_id") + 1000L).as("vec_id"),
      transform(col("embedding"),
        x => (x * lit(1.05) + lit(0.01)).cast("float")).as("embedding"))
    val corpus = base.unionByName(planted)
    val threshold = 0.95
    val local = corpus.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val expect = (for {
      (ia, va) <- local.toSeq; (ib, vb) <- local.toSeq
      if ia < ib && localCosine(va, vb) >= threshold
    } yield (ia, ib)).toSet
    assert(expect.size >= 80, s"planting failed: only ${expect.size} true pairs")
    // 160 rows / 8 = 20 cells over maxCells=4 → 5→8 shards, forced sharding
    val out = Ann.semanticNearDup(corpus, "vec_id", "embedding", threshold,
      targetCellRows = 8, maxCells = 4)
    val rows = out.collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-dup (not exact) pairs may straddle an SRP shard or a cell — the
    // documented accepted-miss class; density+locality must still catch most
    val recall = (expect & got).size.toDouble / expect.size
    assert(recall >= 0.6, s"sharded recall $recall below floor")
    assert((got -- expect).isEmpty, s"unverified pairs leaked: ${got -- expect}")
    // global cell id = shard·maxCells + local cell, non-negative long
    rows.foreach(r => assert(r.getLong(2) >= 0L))
    assertNoCartesian(out)
    val again = Ann.semanticNearDup(corpus, "vec_id", "embedding", threshold,
      targetCellRows = 8, maxCells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "sharded path is not deterministic under a fixed seed")
  }

  test("semanticNearDup shard-size guard: a near-degenerate corpus past " +
    "the per-shard cap salts into bounded sub-shards; bit-equal planted " +
    "duplicates still pair, deterministically") {
    // 150 distinct near-identical directions (one dominant axis, per-row
    // jitter) + one exact copy of each: every row lands in ONE SRP shard
    // (same sign pattern), and 300 rows > the 8·4·4 = 128 cap → the
    // vector-hash salting engages (⌈300/128⌉ = 3 sub-shards). Bit-equal
    // copies share the hash, so every planted exact pair survives.
    val rows = (0L until 150L).map { i =>
      val v = Seq.tabulate(16)(d =>
        (1.0f + (if (d == (i % 16).toInt) 0.001f * ((i % 7) + 1) else 0f)))
      (i, v)
    }
    val base = rows.toDF("vec_id", "embedding")
    val corpus = base.unionByName(base.select(
      (col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    val out = Ann.semanticNearDup(corpus, "vec_id", "embedding",
      threshold = 0.9999999, targetCellRows = 4, maxCells = 4)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 150L).map(i => (i, i + 1000L)).toSet
    assert((planted -- got).isEmpty,
      s"salted regime lost exact-duplicate pairs: ${(planted -- got).take(5)}")
    val again = Ann.semanticNearDup(corpus, "vec_id", "embedding",
      threshold = 0.9999999, targetCellRows = 4, maxCells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == got, "salted regime is not deterministic")
  }

  test("nearDupByCosineAuto L-cap handoff: past the cap it delegates to " +
    "semanticNearDup (exact-duplicate recall parity); below the cap and " +
    "with delegation off, the banded SRP path is unchanged") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 96)
      .select("vec_id", "embedding")
    val corpus = base.unionByName(
      base.select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    val planted = (0L until 96L).map(i => (i, i + 1000L)).toSet
    // threshold 0.8 at b=4 needs L≈5 for recall 0.9: maxTables=2 forces
    // the past-cap regime → delegation engages
    val delegated = Ann.nearDupByCosineAuto(corpus, "vec_id", "embedding",
      threshold = 0.8, dim = 64, maxTables = 2)
    assert(delegated.columns.toSeq == Seq("id_a", "id_b", "cos"))
    val dg = delegated.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((planted -- dg).isEmpty,
      s"delegated path lost exact duplicates: ${(planted -- dg).take(5)}")
    // the delegated result IS semanticNearDup's pair set (same seed)
    val sem = Ann.semanticNearDup(corpus, "vec_id", "embedding",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dg == sem, "delegation drifted from semanticNearDup")
    // delegation OFF at the same cap: the capped banded operator, whose
    // pair set must still contain every exact duplicate
    val capped = Ann.nearDupByCosineAuto(corpus, "vec_id", "embedding",
      threshold = 0.8, dim = 64, maxTables = 2, delegatePastCap = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((planted -- capped).isEmpty)
    // below the cap (default maxTables=32) nothing delegates: the result
    // equals the explicit banded call at the auto-sized (b, L)
    val auto = Ann.nearDupByCosineAuto(corpus, "vec_id", "embedding",
      threshold = 0.8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bits = Ann.srpBitsFor(192L)
    val tables = Ann.srpTablesFor(0.8, bits)
    val banded = Ann.nearDupByCosineBanded(corpus, "vec_id", "embedding",
        threshold = 0.8, dim = 64, nTables = tables, bitsPerTable = bits)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == banded, "below-cap auto path drifted from banded SRP")
  }
}
