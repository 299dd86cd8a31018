package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import scala.util.Random

/** Fourth adversarial batch — full LOCAL REPLAYS of the hash-addressed
  * rows-only operators: the MinHash near-dup pipeline (shingle chain →
  * signature → band slices → Jaccard verify) replayed bit-exactly with
  * the same XXH64 primitives, the incremental-vs-batch metamorphic
  * equality, the DEFLATE length against a local zlib handle, and the
  * count-min sketch counter-for-counter. These pin exactly the outputs
  * the DuckDB oracle cannot reach (no xxhash64 there). */
class AdversarialPropertySpec4 extends SparkSpec {
  import spark.implicits._

  // --- local replay of the engine's hashing pipeline ---
  private def tokHash(t: String): Long = {
    val s = UTF8String.fromString(t)
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
  }
  private def shingles(toks: Seq[String], k: Int): Seq[Long] = {
    val th = toks.map(tokHash)
    def chain(seg: Seq[Long]): Long =
      seg.foldLeft(42L)((h, x) => XXH64.hashLong(x, h))
    if (th.size >= k) (0 to th.size - k).map(w => chain(th.slice(w, w + k)))
    else Seq(chain(th))
  }
  private def signature(sh: Set[Long], numHashes: Int): Seq[Long] =
    (0 until numHashes).map(j => sh.iterator
      .map(s => XXH64.hashLong(s, j.toLong)).min)

  private def word(rnd: Random): String =
    Seq.fill(3)(('a' + rnd.nextInt(26)).toChar).mkString

  private def nearDupCorpus(rnd: Random): Seq[(Long, Seq[String])] = {
    val vocab = Seq.fill(30)(word(rnd)).distinct
    val base = scala.collection.mutable.ArrayBuffer.tabulate(120) { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))))
    }
    var planted = 0 // planted near-dups: copy a long doc, mutate ≤1 token
    while (planted < 15) {
      val i = rnd.nextInt(base.size)
      val j = rnd.nextInt(base.size)
      if (i != j && base(i)._2.size >= 15) {
        var t = base(i)._2
        if (rnd.nextBoolean())
          t = t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size)))
        base(j) = (base(j)._1, t) // j's id, i's (mutated) content
        planted += 1
      }
    }
    base.toSeq
  }

  test("MinHash nearDuplicates == full local XXH64 replay (shingle " +
    "chain, signature, band slices, Jaccard verify)") {
    val (k, nh, bands, t) = (3, 16, 4, 0.5)
    val rnd = new Random(91)
    val corpus = nearDupCorpus(rnd)
    val sets = corpus.map { case (id, toks) =>
      id -> shingles(toks, k).toSet }.toMap
    val sigs = sets.map { case (id, sh) => id -> signature(sh, nh) }
    val r = nh / bands
    def slicesEqual(a: Long, b: Long): Boolean =
      (0 until bands).exists(bd =>
        sigs(a).slice(bd * r, bd * r + r) == sigs(b).slice(bd * r, bd * r + r))
    val ids = corpus.map(_._1)
    val expect = (for {
      a <- ids; b <- ids; if a < b && slicesEqual(a, b)
      j = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      if j >= t
    } yield (a, b, j)).toSet
    assert(expect.size >= 10, s"planting failed: ${expect.size} pairs")
    val got = graft.dedup.MinHashDedup.nearDuplicates(
      corpus.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("id", "text"), "id", "text", t, k, nh, bands)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got == expect, s"minhash drift: ${got.diff(expect).take(3)} / " +
      s"${expect.diff(got).take(3)}")
  }

  test("incrementalNearDups == batch nearDuplicates on the union, " +
    "restricted to increment pairs (metamorphic)") {
    val (k, nh, bands, t) = (3, 16, 4, 0.5)
    val rnd = new Random(37)
    val corpus = nearDupCorpus(rnd)
    val vocabPool = corpus.flatMap(_._2).distinct
    val inc = (0 until 20).map { i =>
      val id = 1000L + i
      if (i < 10) (id, corpus(rnd.nextInt(corpus.size))._2) // corpus dups
      else if (i < 12) (id, corpus.head._2)                 // internal dup pair
      else (id, Seq.fill(8 + rnd.nextInt(10))(
        vocabPool(rnd.nextInt(vocabPool.size))))
    }
    def df(rows: Seq[(Long, Seq[String])]) =
      rows.map { case (id, toks) => (id, toks.mkString(" ")) }
        .toDF("id", "text")
    val corpusSets = graft.dedup.MinHashDedup.shingleSets(
      df(corpus), "id", "text", k)
    val corpusBands = graft.dedup.MinHashDedup.bandIndex(corpusSets, nh, bands)
    val incr = graft.dedup.MinHashDedup.incrementalNearDups(
      df(inc), "id", "text", corpusBands, corpusSets, t, k, nh, bands)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    val batch = graft.dedup.MinHashDedup.nearDuplicates(
      df(corpus ++ inc), "id", "text", t, k, nh, bands)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
      .filter(_._2 >= 1000L)            // pairs whose HIGHER id is new
      .map { case (a, b, j) => (b, a, j) }.toSet
    assert(incr.nonEmpty && incr == batch,
      s"incremental != batch: ${incr.diff(batch).take(3)} / " +
        s"${batch.diff(incr).take(3)}")
  }

  // simhash replay: bit-majority over the token-hash MULTISET (votes
  // count per occurrence; xxhash64(token) is the same seed-42 UTF-8
  // hash as tokHash)
  private def simhash(toks: Seq[String]): Long = {
    val hs = toks.map(tokHash)
    val ones = new Array[Int](64)
    hs.foreach { h =>
      (0 until 64).foreach(b => ones(b) += ((h >>> b) & 1L).toInt)
    }
    (0 until 64).foldLeft(0L)((fp, b) =>
      if (ones(b) * 2 > hs.size) fp | (1L << b) else fp)
  }
  private def chunk(s: Long, c: Int): Long = (s >>> (c * 16)) & 0xFFFFL

  test("SimHash nearDuplicates (radius 3) and multi-probe (radius 7) == " +
    "local bit-majority replay with chunk pigeonhole") {
    val rnd = new Random(53)
    val vocab = Seq.fill(50)(word(rnd)).distinct
    val base = scala.collection.mutable.ArrayBuffer.tabulate(100) { i =>
      (i.toLong, Seq.fill(40 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))))
    }
    var planted = 0 // copy a doc, change exactly one token: tiny hamming
    while (planted < 20) {
      val i = rnd.nextInt(base.size); val j = rnd.nextInt(base.size)
      if (i != j) {
        val t = base(i)._2
        base(j) = (base(j)._1,
          t.updated(rnd.nextInt(t.size), vocab(rnd.nextInt(vocab.size))))
        planted += 1
      }
    }
    val sigs = base.toSeq.map { case (id, t) => id -> simhash(t) }.toMap
    val ids = base.toSeq.map(_._1)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val docsDf = base.toSeq
      .map { case (id, t) => (id, t.mkString(" ")) }.toDF("id", "text")
    // radius-3: candidates share an EQUAL 16-bit chunk
    val expect3 = (for {
      a <- ids; b <- ids
      if a < b && (0 until 4).exists(c => chunk(sigs(a), c) == chunk(sigs(b), c))
      h = ham(sigs(a), sigs(b)); if h <= 3
    } yield (a, b, h.toLong)).toSet
    val got3 = graft.dedup.SimHash.nearDuplicates(docsDf, "id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    assert(expect3.size >= 5, s"radius-3 planting failed: ${expect3.size}")
    assert(got3 == expect3, s"simhash drift: ${got3.diff(expect3).take(3)} " +
      s"/ ${expect3.diff(got3).take(3)}")
    // radius-7 multi-probe: candidates have a chunk differing in ≤ 1 bit
    val expect7 = (for {
      a <- ids; b <- ids
      if a < b && (0 until 4).exists(c =>
        java.lang.Long.bitCount(chunk(sigs(a), c) ^ chunk(sigs(b), c)) <= 1)
      h = ham(sigs(a), sigs(b)); if h <= 7
    } yield (a, b, h.toLong)).toSet
    val got7 = graft.dedup.SimHash.nearDuplicatesMultiProbe(
      docsDf, "id", "text", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue)).toSet
    assert(expect7.size > expect3.size, "multi-probe plants missing")
    assert(got7 == expect7, s"multiprobe drift: " +
      s"${got7.diff(expect7).take(3)} / ${expect7.diff(got7).take(3)}")
  }

  test("deflate_len == a local zlib Deflater(6, nowrap) byte count") {
    val rnd = new Random(12)
    val texts = Seq("", "a", "aaaaaaaaaaaaaaaaaaaaaaa", "héllo wörld ☃",
      ("abc" * 400) + "tail") ++
      (0 until 200).map(_ => Seq.fill(rnd.nextInt(300))(word(rnd))
        .mkString(" "))
    def local(s: String): Int = {
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val got = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.DeflateLen(spark, col("text")).as("dl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    texts.zipWithIndex.foreach { case (s, i) =>
      assert(got(i.toLong) == local(s),
        s"deflate drift on #$i: ${got(i.toLong)} vs ${local(s)}")
    }
  }

  test("bpe_encode == an independent local merge-loop replay, trained " +
    "merges, unicode/emoji/empty edge texts") {
    val rnd = new Random(71)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta")
    val docs = (0 until 80).map(i => (i.toLong,
      Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")))
    val merges = graft.textstats.Bpe.trainMerges(
      docs.toDF("id", "text").select(col("text").as("t")), "t",
      numMerges = 40)
    assert(merges.size >= 20, s"training produced ${merges.size} merges")
    val ranks = merges.zipWithIndex.map { case (m, i) =>
      val p = m.split(graft.functions.BpeEncode.Sep)
      ((p(0), p(1)), i) }.toMap
    val byRank = ranks.map(_.swap)
    def cps(w: String): Vector[String] = {
      var out = Vector.empty[String]; var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        out :+= new String(Character.toChars(cp))
        ci += Character.charCount(cp)
      }
      out
    }
    def encodeWord(w: String): Seq[String] = {
      var syms = cps(w)
      var done = syms.size <= 1
      while (!done) {
        val cands = (0 until syms.size - 1)
          .flatMap(i => ranks.get((syms(i), syms(i + 1))))
        if (cands.isEmpty) done = true
        else {
          val (a, b) = byRank(cands.min)
          val nb = Vector.newBuilder[String]; var j = 0
          while (j < syms.size) {
            if (j < syms.size - 1 && syms(j) == a && syms(j + 1) == b) {
              nb += (a + b); j += 2
            } else { nb += syms(j); j += 1 }
          }
          syms = nb.result(); done = syms.size <= 1
        }
      }
      syms
    }
    def local(t: String): Seq[String] =
      t.split("\\s+").filter(_.nonEmpty).toSeq.flatMap(encodeWord)
    val texts = docs.map(_._2) ++ Seq("", "   ", "aaa aaa  aaa",
      "héllo ☃ 👍👍", "alphabetagamma zetaeta")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        graft.functions.BpeEncode(spark, col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == local(t),
        s"bpe drift on #$i '${t.take(30)}': ${got(i.toLong).take(8)} vs " +
          s"${local(t).take(8)}")
    }
  }

  test("CountMinAggregator == local counter replay; estimates bound " +
    "true counts from above") {
    val (d, w) = (4, 64)
    val rnd = new Random(29)
    // zipf-ish stream: a few heavy keys, a long tail
    val keys = (0 until 5000).map { _ =>
      val z = rnd.nextInt(10)
      if (z < 5) s"heavy${rnd.nextInt(3)}" else s"tail${rnd.nextInt(500)}"
    }
    val hashes = keys.map(graft.functions.CountMinSketch.hashString)
    val local = new Array[Long](d * w)
    hashes.foreach { h =>
      (0 until d).foreach(r =>
        local(r * w + graft.functions.CountMinSketch.cell(h, r, w)) += 1L)
    }
    val agg = new graft.functions.CountMinAggregator(d, w).toColumn
    val sketch = hashes.toDS().select(agg).head()
    assert(sketch.toSeq == local.toSeq, "sketch counters drift from replay")
    val truth = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    truth.foreach { case (key, n) =>
      val est = graft.functions.CountMinSketch.estimate(
        sketch, graft.functions.CountMinSketch.hashString(key), d, w)
      assert(est >= n, s"$key: estimate $est under truth $n")
      assert(est <= n + keys.size / 8, s"$key: estimate $est way over $n")
    }
  }
}
