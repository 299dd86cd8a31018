package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Adversarial randomized-input tests for the most intricate operators:
  * each test generates a seeded random corpus larger and nastier than
  * the hand cases (short docs, self-loops, chains past the propagation
  * budget, within-doc repeats, boundary-straddling segments) and checks
  * the DISTRIBUTED result EXACTLY against an independent local
  * reimplementation — not invariants, full-output equality. Seeds are
  * fixed so failures replay. */
class AdversarialPropertySpec extends SparkSpec {
  import spark.implicits._

  // three-letter alphabetic tokens: survive cleanText unchanged (no
  // digits/punct), 17576-word space
  private def word(rnd: Random): String =
    Seq.fill(3)(('a' + rnd.nextInt(26)).toChar).mkString

  test("connectedComponents == local union-find on random graphs with " +
    "self-loops, cliques, and a chain past the propagation budget") {
    for (seed <- Seq(7, 23)) {
      val rnd = new Random(seed)
      val ids = Seq.fill(300)(rnd.nextInt(1000).toLong).distinct
      val randomEdges = Seq.fill(350)(
        (ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
      // a 64-node chain on fresh ids: diameter 63 > maxIters 20, so the
      // label-propagation loop must hand off to the star fallback
      val chainIds = (0 until 64).map(i => 5000L + 7L * i)
      val chain = chainIds.sliding(2).map(s => (s(0), s(1))).toSeq
      val cliqueIds = ids.take(12)
      val clique = for (a <- cliqueIds; b <- cliqueIds; if a < b) yield (a, b)
      val edges = rnd.shuffle(randomEdges ++ chain ++ clique)
      // local union-find oracle (path compression, min-id component)
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(x => x -> find(x)).toMap
      val got = graft.dedup.DedupGroups.connectedComponents(
        edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect,
        s"seed $seed: CC drift on ${got.toSet.diff(expect.toSet)} / " +
          s"${expect.toSet.diff(got.toSet)}")
    }
  }

  test("epochOrder == the local sort of the replayed scramble key; pos " +
    "is a permutation, epochs decorrelate") {
    val M = 2147483647L
    def localKey(id: Long, epoch: Int): Long = {
      val s0 = (((id + epoch.toLong * 1000003L) % M) + M) % M
      val s1 = (s0 * 48271L) % M
      val s2 = s1 ^ (s1 >> 15)
      val s3 = (s2 * 69621L) % M
      s3 ^ (s3 >> 13)
    }
    val rnd = new Random(11)
    val ids = (Seq.fill(2000)(rnd.nextLong() % 1000000000000L).distinct ++
      Seq(-5L, -987654321L, 0L, M, M + 1L)).distinct
    for (epoch <- Seq(0, 3)) {
      val expect = ids.map(id => (localKey(id, epoch), id)).sorted
        .zipWithIndex.map { case ((k, id), i) => id -> ((k, i.toLong)) }
        .toMap
      val got = graft.operators.EpochShuffle.epochOrder(
        ids.toDF("id"), "id", epoch, nBuckets = 16)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == expect, s"epoch $epoch: order drift")
      assert(got.values.map(_._2).toSet == ids.indices.map(_.toLong).toSet)
    }
    // different epochs must not be a rotation of the same order
    val o0 = graft.operators.EpochShuffle.epochOrder(
      ids.toDF("id"), "id", 0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val o3 = graft.operators.EpochShuffle.epochOrder(
      ids.toDF("id"), "id", 3).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val agree = ids.count(id => o0(id) == o3(id))
    assert(agree < ids.size / 10, s"epochs correlate: $agree fixed points")
  }

  test("SampleIndex.plan == local concatenation layout on random " +
    "lengths; zero-token docs excluded, segments tile every sample") {
    val rnd = new Random(42)
    val seqLen = 128
    val docs = (0 until 1500).map { i =>
      val id = i.toLong * 3 + rnd.nextInt(3) // sparse, still unique: 3i+r
      (id, if (rnd.nextInt(20) == 0) 0L else 1L + rnd.nextInt(300).toLong)
    }.distinctBy(_._1)
    val kept = docs.filter(_._2 >= 1).sortBy(_._1)
    val offs = kept.scanLeft(0L)(_ + _._2).init
    val expect = kept.zip(offs).flatMap { case ((id, n), off) =>
      (off / seqLen to (off + n - 1) / seqLen).map { s =>
        (s, id, math.max(0L, s * seqLen - off),
          math.min(off + n, (s + 1) * seqLen) - math.max(off, s * seqLen))
      }
    }.toSet
    val got = graft.operators.SampleIndex.plan(
      docs.toDF("id", "n_tok"), "id", "n_tok", seqLen, nBuckets = 32)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expect,
      s"layout drift: ${got.diff(expect).take(5)} / ${expect.diff(got).take(5)}")
    // every full sample is tiled exactly: seg_lens sum to seqLen
    val total = kept.map(_._2).sum
    got.groupBy(_._1).foreach { case (s, segs) =>
      val len = segs.toSeq.map(_._4).sum
      val want = if (s == total / seqLen) total - s * seqLen else seqLen
      assert(len == want, s"sample $s tiles $len of $want")
    }
  }

  test("scrubDuplicateSpans == local gram-cover replay with planted " +
    "spans, exact duplicates, within-doc repeats, and sub-gram docs") {
    val n = 8
    val rnd = new Random(99)
    val vocab = Seq.fill(40)(word(rnd)).distinct
    val base = scala.collection.mutable.ArrayBuffer.tabulate(200) { i =>
      (i.toLong,
        Seq.fill(3 + rnd.nextInt(48))(vocab(rnd.nextInt(vocab.size))))
    }
    // plant shared 12-token spans across 25 random pairs
    for (_ <- 0 until 25) {
      val (i, j) = (rnd.nextInt(base.size), rnd.nextInt(base.size))
      val (si, sj) = (base(i)._2, base(j)._2)
      if (i != j && si.size >= 12 && sj.size >= 12) {
        val span = si.slice(0, 12)
        val at = rnd.nextInt(sj.size - 12 + 1)
        base(j) = (base(j)._1, sj.patch(at, span, 12))
      }
    }
    // exact duplicates (whole-doc scrub both ways)
    for (k <- 0 until 5)
      base(190 + k) = ((190 + k).toLong, base(k)._2)
    // a within-doc repeat: the same 8-gram twice inside one doc
    base(100) = (100L, base(100)._2.take(8) ++ base(100)._2.take(8))
    val docs = base.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
    // local oracle: gram = token tuple (whole doc when nt < n); corpus
    // occurrence counts over POSITIONS; covered = union of p..p+n-1
    val grams = base.toSeq.flatMap { case (id, t) =>
      if (t.size < n) Seq((id, 0, t))
      else (0 to t.size - n).map(p => (id, p, t.slice(p, p + n)))
    }
    val occ = grams.groupBy(_._3).map { case (g, v) => g -> v.size }
    val expect = base.toSeq.map { case (id, t) =>
      val cov = grams.filter(g => g._1 == id && occ(g._3) >= 2)
        .flatMap(g => g._2 to math.min(g._2 + n - 1, t.size - 1)).toSet
      val keptToks = t.zipWithIndex.collect {
        case (tok, i) if !cov.contains(i) => tok }
      (id, keptToks.mkString(" "), t.size.toLong, cov.size.toLong)
    }.toSet
    val got = graft.dedup.SpanScrub.scrubDuplicateSpans(
      docs.toDF("id", "text"), "id", "text", n)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2).toLong,
        r.getInt(3).toLong))
      .toSet
    assert(got == expect,
      s"scrub drift: ${got.diff(expect).take(3)} / ${expect.diff(got).take(3)}")
  }

  test("containedPairs == local distinct-gram containment on planted " +
    "excerpts with mutations") {
    val n = 3
    val threshold = 0.8
    val rnd = new Random(5)
    val base = scala.collection.mutable.ArrayBuffer.tabulate(60) { i =>
      (i.toLong, Seq.fill(20 + rnd.nextInt(21))(word(rnd)))
    }
    // 40 probes: contiguous excerpts of containers, some with a mutated
    // token (drops containment below 1.0, sometimes below threshold)
    for (k <- 0 until 40) {
      val (_, src) = base(rnd.nextInt(60))
      val len = 8 + rnd.nextInt(8)
      val at = rnd.nextInt(src.size - len + 1)
      var ex = src.slice(at, at + len)
      if (k % 3 == 0) ex = ex.updated(rnd.nextInt(ex.size), word(rnd))
      base += ((100L + k, ex))
    }
    val docs = base.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
    def gramSet(t: Seq[String]): Set[Seq[String]] =
      if (t.size < n) Set(t) else t.sliding(n).map(_.toSeq).toSet
    val sets = base.toSeq.map { case (id, t) => id -> gramSet(t) }.toMap
    val expect = (for {
      (ia, a) <- sets.toSeq; (ib, b) <- sets.toSeq
      if a.size < b.size || (a.size == b.size && ia < ib)
      c = a.intersect(b).size.toDouble / a.size
      if c >= threshold
    } yield (ia, ib, c)).toSet
    val got = graft.dedup.Containment.containedPairs(
      docs.toDF("id", "text"), "id", "text", n, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(expect.size >= 20, s"planting failed: only ${expect.size} pairs")
    assert(got == expect,
      s"containment drift: ${got.diff(expect).take(3)} / " +
        s"${expect.diff(got).take(3)}")
  }
}
