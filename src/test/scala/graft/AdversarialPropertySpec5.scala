package graft

import org.apache.spark.sql.functions._

import graft.similarity.Ann
import graft.sources.Tables

/** Fifth adversarial batch — full LOCAL REPLAYS of the ANN shortlist
  * paths, moving q93 (SRP-bucketed top-k), q49 (IVF top-k) and q42
  * (int8-quantized top-k) from invariant-pinned (recall floors) to
  * VALUE-pinned: every (query_id, cand_id, rank) row and every cosine
  * DOUBLE must equal an independent local reimplementation bit-for-bit.
  * The replays rebuild the seeded hyperplanes from the same
  * `Random(seed).nextGaussian()` stream, replicate DotProduct's
  * widen-then-multiply ascending accumulation, re-run k-means++/Lloyd
  * from the same seeded draw sequence (a from-scratch functional
  * rewrite, not a mirror of the production while-loops), and replicate
  * the HALF_UP int8 quantization — so any drift in plane generation,
  * normalization, tie-breaking, probe ordering, or rescore arithmetic
  * fails the equality, not just a recall threshold. A fourth replay
  * value-pins q164: randomSplit membership against a from-scratch
  * XORShiftRandom/Bernoulli-cell sampler replica. */
class AdversarialPropertySpec5 extends SparkSpec {
  import spark.implicits._

  // --- local replicas of the engine's arithmetic conventions ---

  /** DotProduct's loop: widen each element to double, multiply, ascending
    * accumulate. */
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** sqDist's fold: (x−y)² in double, ascending accumulate. */
  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** normalizedCarry's convention: norm = √(Σ x·x) with float widened
    * BEFORE the multiply; zero-norm vectors stay zero. */
  private def normalize(v: Seq[Float]): Array[Double] = {
    val n = math.sqrt(v.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
    if (n == 0.0) Array.fill(v.length)(0.0)
    else v.map(x => x.toDouble / n).toArray
  }

  /** Ann.planes: one Random(seed), nPlanes × dim nextGaussian draws in
    * plane-major order. */
  private def planes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** srpBucket: bit i = sign(v̂·plane_i), summed. */
  private def srpBucket(v: Array[Double], ps: Seq[Array[Double]]): Int =
    ps.zipWithIndex.map { case (p, i) =>
      if (dot(v, p) >= 0.0) 1 << i else 0 }.sum

  /** rankTopK: per query, (cos desc, cand_id asc), ranks 1..k. */
  private def rankTopK(scored: Seq[(Long, Long, Double)],
                       k: Int): Seq[(Long, Long, Int, Double)] =
    scored.groupBy(_._1).toSeq.flatMap { case (q, cs) =>
      cs.sortBy(t => (-t._3, t._2)).take(k).zipWithIndex
        .map { case ((_, c, cos), r) => (q, c, r + 1, cos) }
    }

  /** The corpus in COLLECT ORDER (order feeds the k-means replay) plus a
    * lookup map of normalized vectors. */
  private def loadCorpus(maxId: Long): (Seq[(Long, Array[Double])],
      Map[Long, Array[Double]]) = {
    val rows = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < maxId).select("vec_id", "embedding")
      .collect().toSeq
      .map(r => r.getLong(0) -> normalize(r.getSeq[Float](1)))
    (rows, rows.toMap)
  }

  test("lshTopK == full local SRP replay: planes, buckets, in-bucket " +
    "cosines, (cos desc, cand asc) ranks — doubles bit-exact") {
    val (k, nPlanes, dim, seed) = (5, 4, 64, 42L)
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 300)
    val queries = corpus.filter(col("vec_id") < 8)
    val got = Ann.lshTopK(corpus, queries, "vec_id", "embedding",
        k, nPlanes, dim, seed)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet

    val (ordered, local) = loadCorpus(300L)
    val ps = planes(nPlanes, dim, seed)
    val bucket = local.map { case (id, v) => id -> srpBucket(v, ps) }
    val scored = for {
      (qid, qv) <- ordered.filter(_._1 < 8)
      (cid, cv) <- ordered
      if cid != qid && bucket(cid) == bucket(qid)
    } yield (qid, cid, dot(qv, cv))
    val expect = rankTopK(scored, k).toSet
    assert(expect.nonEmpty && got == expect,
      s"lshTopK drifted from the local replay: got ${got.size} rows, " +
        s"expected ${expect.size}; diff=${(got diff expect).take(3)}")
  }

  /** Independent k-means++ / Lloyd replay: the same seeded draw sequence
    * (first center nextInt; each next center d2-weighted nextDouble with
    * the `r > d2(j)` scan semantics) and the same FP accumulation orders
    * (ascending-index d2 sum, encounter-order cluster means), written as
    * fold/groupBy passes rather than the production's mutable loops. */
  private def kmeansReplay(pts: Seq[Array[Double]], nCentroids: Int,
                           seed: Long, maxIter: Int = 10): Seq[Array[Double]] = {
    val k = math.min(nCentroids, pts.length)
    val rnd = new scala.util.Random(seed)
    val d2 = Array.fill(pts.length)(Double.MaxValue)
    var centers = Vector(pts(rnd.nextInt(pts.length)).clone())
    while (centers.length < k) {
      pts.indices.foreach(i =>
        d2(i) = math.min(d2(i), sqDist(pts(i), centers.last)))
      val total = d2.sum
      val next =
        if (total == 0.0) pts(rnd.nextInt(pts.length)).clone()
        else {
          var r = rnd.nextDouble() * total
          var j = 0
          while (j < pts.length - 1 && r > d2(j)) { r -= d2(j); j += 1 }
          pts(j).clone()
        }
      centers = centers :+ next
    }
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      val cs = centers
      val assigned = pts.map(p =>
        cs.indices.minBy(c => (sqDist(p, cs(c)), c)))
      val groups = pts.zip(assigned).groupBy(_._2) // keeps encounter order
      val updated = cs.indices.map { c =>
        groups.get(c) match {
          case Some(members) if members.nonEmpty =>
            val sum = members.map(_._1).foldLeft(
              Array.fill(cs(c).length)(0.0)) { (acc, p) =>
                acc.indices.foreach(j => acc(j) += p(j)); acc }
            sum.indices.foreach(j => sum(j) /= members.length)
            sum
          case _ => cs(c)
        }
      }.toVector
      moved = cs.indices.exists(c => sqDist(updated(c), cs(c)) > 1e-12)
      centers = updated
      iter += 1
    }
    centers
  }

  test("ivfTopK == full local replay: independent k-means++/Lloyd from " +
    "the same seed, argmin cells, (d, cell)-ordered probes, in-cell " +
    "cosines — doubles bit-exact") {
    val (k, nCentroids, nProbe, seed) = (5, 8, 2, 42L)
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 300)
    val queries = corpus.filter(col("vec_id") < 8)
    val got = Ann.ivfTopK(corpus, queries, "vec_id", "embedding",
        k, nCentroids, nProbe, seed)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet

    // 300 rows ≤ nCentroids·256, so production trains on the FULL corpus
    // in collect order — the replay sees the identical point stream
    val (ordered, _) = loadCorpus(300L)
    val centers = kmeansReplay(ordered.map(_._2), nCentroids, seed)
    val cell = ordered.map { case (id, v) =>
      id -> centers.indices.minBy(c => (sqDist(v, centers(c)), c)) }.toMap
    val scored = for {
      (qid, qv) <- ordered.filter(_._1 < 8)
      probes = centers.indices
        .sortBy(c => (sqDist(qv, centers(c)), c)).take(nProbe).toSet
      (cid, cv) <- ordered
      if cid != qid && probes.contains(cell(cid))
    } yield (qid, cid, dot(qv, cv))
    val expect = rankTopK(scored, k).toSet
    assert(expect.nonEmpty && got == expect,
      s"ivfTopK drifted from the local replay: got ${got.size} rows, " +
        s"expected ${expect.size}; diff=${(got diff expect).take(3)}")
  }

  test("bruteForceTopKQuantized == full local replay: HALF_UP int8 " +
    "quantization, scaled integer coarse scores, rerank shortlist, " +
    "exact rescore — doubles bit-exact") {
    val (k, rerank) = (5, 12)
    val corpus = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 300)
    val queries = corpus.filter(col("vec_id") < 8)
    val got = Ann.bruteForceTopKQuantized(corpus, queries, "vec_id",
        "embedding", k, rerank)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet

    val (ordered, _) = loadCorpus(300L)
    // quantized(): scale = max|v̂|/127, q = round(v̂/scale) — Spark round()
    // is BigDecimal HALF_UP (away from zero on .5), NOT math.round
    def quantize(v: Array[Double]): (Array[Double], Double) = {
      val scale = v.map(math.abs).max / 127.0
      val q =
        if (scale == 0.0) Array.fill(v.length)(0.0)
        else v.map(x => java.math.BigDecimal.valueOf(x / scale)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .doubleValue().toByte.toDouble)
      (q, scale)
    }
    val quant = ordered.map { case (id, v) => id -> quantize(v) }.toMap
    val coarse = for {
      (qid, _) <- ordered.filter(_._1 < 8)
      (cid, _) <- ordered
      if cid != qid
    } yield {
      val (qa, sa) = quant(qid)
      val (qb, sb) = quant(cid)
      // qDot's multiply order: (dot · s_query) · s_cand
      (qid, cid, dot(qa, qb) * sa * sb)
    }
    val shortlist = coarse.groupBy(_._1).toSeq.flatMap { case (_, cs) =>
      cs.sortBy(t => (-t._3, t._2)).take(rerank) }
    val rescored = shortlist.map { case (qid, cid, _) =>
      (qid, cid, dot(ordered.toMap.apply(qid), ordered.toMap.apply(cid))) }
    val expect = rankTopK(rescored, k).toSet
    assert(expect.nonEmpty && got == expect,
      s"quantized top-k drifted from the local replay: got ${got.size} " +
        s"rows, expected ${expect.size}; diff=${(got diff expect).take(3)}")
  }

  /** The xorshift generator Spark seeds its per-partition samplers with —
    * reimplemented from the published algorithm (hash the seed through two
    * chained MurmurHash3 byte hashes, then the 21/35/4 xorshift; nextDouble
    * is java.util.Random's 26+27-bit composition over that next()). Not an
    * import of Spark's private class: any drift between this replica and
    * the engine fails the equality below. */
  private final class LocalXorShift(init: Long) {
    private var s: Long = {
      val bytes = java.nio.ByteBuffer.allocate(8).putLong(init).array()
      val low = scala.util.hashing.MurmurHash3.bytesHash(bytes)
      val high = scala.util.hashing.MurmurHash3.bytesHash(bytes, low)
      (high.toLong << 32) | (low.toLong & 0xFFFFFFFFL)
    }
    private def next(bits: Int): Int = {
      var n = s ^ (s << 21); n ^= (n >>> 35); n ^= (n << 4); s = n
      (n & ((1L << bits) - 1)).toInt
    }
    def nextDouble(): Double =
      ((next(26).toLong << 27) + next(27)) * (1.0 / (1L << 53))
  }

  test("randomSplit == a local XORShiftRandom/BernoulliCellSampler replay " +
    "of Spark's per-partition sampling (q164 membership value-pinned)") {
    // Split membership is a pure function of (partition index,
    // within-partition sorted row order, the seeded draw sequence) — all
    // published Dataset.randomSplit semantics: a partition-local sort on
    // every orderable output column for determinism, then one Bernoulli
    // cell per row with acceptance x ∈ [cumWeight_i, cumWeight_i+1) from
    // an XORShiftRandom seeded seed + partitionIndex, each split drawing
    // the SAME sequence. The replay recomputes membership row-for-row on
    // the driver; set equality (not a count) must hold, so any drift in
    // the sort convention, the seeding, the hash-seed chain, or the
    // draw arithmetic fails here.
    val seed = 100L
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").filter(col("doc_id") < 400)
    val Array(tr, te) = docs.randomSplit(Array(0.8, 0.2), seed)
    val trIds = tr.select("doc_id").collect().map(_.getLong(0)).toSet
    val teIds = te.select("doc_id").collect().map(_.getLong(0)).toSet
    assert((trIds & teIds).isEmpty && (trIds ++ teIds).size >= 300)

    // doc_id leads the sort-key tuple and is unique, so the partition-local
    // order is total; collect() preserves (partition, intra-partition) order
    val parts = docs
      .sortWithinPartitions(docs.columns.map(col).toIndexedSeq: _*)
      .rdd.mapPartitionsWithIndex((pid, it) =>
        it.map(r => (pid, r.getLong(0))))
      .collect()
    val replayTr = Set.newBuilder[Long]
    val replayTe = Set.newBuilder[Long]
    var rng: LocalXorShift = null
    var cur = -1
    parts.foreach { case (pid, id) =>
      if (pid != cur) { rng = new LocalXorShift(seed + pid); cur = pid }
      // normalized cumulative weights of Array(0.8, 0.2) are exactly
      // [0.0, 0.8, 1.0] in doubles; nextDouble() < 1.0 always
      if (rng.nextDouble() < 0.8) replayTr += id else replayTe += id
    }
    assert(replayTr.result() == trIds,
      "train membership drifted from the local sampler replay")
    assert(replayTe.result() == teIds,
      "test membership drifted from the local sampler replay")
  }
}
