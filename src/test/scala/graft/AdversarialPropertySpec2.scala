package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Second adversarial batch (the rest of the round-7 verdict's
  * "most complex" list): assembly plans, decontamination, sorted
  * neighborhood, SCD2 increments, and CDC merge — randomized inputs,
  * exact local-oracle (or metamorphic full-rebuild) equality. */
class AdversarialPropertySpec2 extends SparkSpec {
  import spark.implicits._

  private def word(rnd: Random): String =
    Seq.fill(3)(('a' + rnd.nextInt(26)).toChar).mkString

  test("assemblyPlan == local mutual-best chain walk on random weighted " +
    "pair graphs with fan-in/out, ties, and cycles") {
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      val raw = Seq.fill(300)((rnd.nextInt(200).toLong,
        rnd.nextInt(200).toLong,
        Seq(5000L, 7500L, 10000L)(rnd.nextInt(3)))) // coarse bp: many ties
      // a guaranteed long chain on fresh ids, plus a 3-cycle (must NOT
      // appear in the plan: no head to walk from)
      val chain = (0 until 40).sliding(2).map(s =>
        (1000L + s(0), 1000L + s(1), 10000L)).toSeq
      val cycle = Seq((2000L, 2001L, 10000L), (2001L, 2002L, 10000L),
        (2002L, 2000L, 10000L))
      val pairs = (raw ++ chain ++ cycle)
        .filter(p => p._1 != p._2)
        .groupBy(p => (p._1, p._2)).map(_._2.head).toSeq // distinct pairs
      // local oracle
      def best(edges: Seq[(Long, Long, Long)], by: ((Long, Long, Long)) => Long,
               pick: ((Long, Long, Long)) => Long) =
        edges.groupBy(by).map { case (k, es) =>
          k -> pick(es.maxBy(e => (e._3, -pick(e))))
        }
      val succ = best(pairs, _._1, _._2)
      val pred = best(pairs, _._2, _._1)
      val kept = pairs.collect { case (a, b, _)
        if succ(a) == b && pred(b) == a => (a, b) }
      val keptSucc = kept.toMap
      val headIds = kept.map(_._1).toSet -- kept.map(_._2).toSet
      // chain walk + min-id component along each walked chain
      val expect = headIds.flatMap { h =>
        val path = Iterator.iterate(Option(h))(
          _.flatMap(keptSucc.get)).takeWhile(_.isDefined).map(_.get).toSeq
        // component = min id over the UNDIRECTED kept component; a walked
        // chain is a whole component, so its min suffices
        val comp = path.min
        path.zipWithIndex.map { case (id, pos) => (id, comp, pos.toLong) }
      }
      val got = graft.dedup.Stitch.assemblyPlan(
        pairs.toDF("id_a", "id_b", "overlap_bp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == expect, s"seed $seed: plan drift " +
        s"${got.diff(expect).take(5)} / ${expect.diff(got).take(5)}")
      // the kept 3-cycle has no head: it must not be walked into the plan
      assert(!got.exists(r => Set(2000L, 2001L, 2002L)(r._1)),
        s"cycle leaked into the plan: $got")
    }
  }

  test("contaminationHits == local distinct-gram intersection; shuffle " +
    "variant identical to broadcast") {
    val n = 8
    val rnd = new Random(31)
    val vocab = Seq.fill(60)(word(rnd)).distinct
    val bench = (0 until 20).map(i =>
      (i.toLong, Seq.fill(10 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))))
    val corpus = scala.collection.mutable.ArrayBuffer.tabulate(150) { i =>
      (100L + i, Seq.fill(4 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))))
    }
    // plant benchmark spans into some corpus docs (8..14 tokens)
    for (_ <- 0 until 30) {
      val (_, bt) = bench(rnd.nextInt(bench.size))
      val j = rnd.nextInt(corpus.size)
      val (cid, ct) = corpus(j)
      val len = math.min(8 + rnd.nextInt(7), bt.size)
      if (ct.size >= len) {
        val at = rnd.nextInt(ct.size - len + 1)
        corpus(j) = (cid, ct.patch(at, bt.take(len), len))
      }
    }
    def grams(t: Seq[String]): Set[Seq[String]] =
      if (t.size < n) Set(t) else t.sliding(n).map(_.toSeq).toSet
    val benchGrams = bench.flatMap(b => grams(b._2)).toSet
    val minHits = 2
    val expect = corpus.toSeq.map { case (id, t) =>
      id -> grams(t).count(benchGrams.contains).toLong
    }.filter(_._2 >= minHits).toMap
    assert(expect.nonEmpty, "planting produced no contamination")
    val corpusDf = corpus.toSeq.map { case (id, t) => (id, t.mkString(" ")) }
      .toDF("id", "text")
    val benchDf = bench.map { case (id, t) => (id, t.mkString(" ")) }
      .toDF("id", "text")
    val got = graft.dedup.Decontaminate.contaminationHits(
      corpusDf, benchDf, "id", "text", n, minHits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect, s"hits drift: ${got.toSet.diff(expect.toSet)} / " +
      s"${expect.toSet.diff(got.toSet)}")
    val gotShuffle = graft.dedup.Decontaminate.contaminationHitsShuffle(
      corpusDf, benchDf, "id", "text", n, minHits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotShuffle == got, "broadcast and shuffle variants disagree")
  }

  test("sortedNeighborhood == local global-rank window with heavy key " +
    "ties and tiny blocks") {
    val rnd = new Random(13)
    val alphabet = "abc"
    val rows = (0 until 500).map { i =>
      (i.toLong, Seq.fill(3)(alphabet(rnd.nextInt(3))).mkString)
    }
    val w = 4
    val ranked = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
    val expect = (for {
      ((ia, _), ra) <- ranked; ((ib, _), rb) <- ranked
      if rb > ra && rb - ra <= w
    } yield (ia, ib, (rb - ra).toLong)).toSet
    val got = graft.operators.RecordLinkage.sortedNeighborhood(
      rows.toDF("id", "k"), "id", "k", w, blockSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, s"neighborhood drift: " +
      s"${got.diff(expect).take(5)} / ${expect.diff(got).take(5)}")
  }

  test("SCD2: applyIncrement == full rebuild across random time splits " +
    "(metamorphic), with ts ties and increment-only keys") {
    val rnd = new Random(77)
    val events = (0 until 2000).map { i =>
      (rnd.nextInt(100).toLong,           // key
        (rnd.nextInt(400) * 1000L),       // ts micros, heavy ties
        i.toLong,                          // event id (tie col)
        rnd.nextInt(4).toLong)             // band attr
    }
    val df = events.toDF("k", "ts_us", "eid", "band")
    val full = graft.operators.Scd.buildScd2(df, "k", "ts_us", "eid",
      Seq("band")).collect().map(_.toSeq).toSet
    for (splitT <- Seq(100000L, 250000L, 380000L)) {
      val dim = graft.operators.Scd.buildScd2(
        df.filter(col("ts_us") < splitT), "k", "ts_us", "eid", Seq("band"))
      val inc = df.filter(col("ts_us") >= splitT)
      val got = graft.operators.Scd.applyIncrement(dim, inc, "k", "ts_us",
        "eid", Seq("band")).collect().map(_.toSeq).toSet
      assert(got == full, s"split $splitT: incremental != full rebuild")
    }
  }

  test("Merge.applyChanges == local map apply with inserts, updates, " +
    "null-payload updates, and deletes") {
    val rnd = new Random(55)
    val base = (0 until 500).map(i =>
      (i.toLong, word(rnd), rnd.nextInt(1000).toLong))
    val ops = rnd.shuffle(
      (0 until 200).map(i => (1000L + i, "insert")) ++   // fresh ids
        rnd.shuffle(base.map(_._1)).take(150).map(id => (id, "update")) ++
        rnd.shuffle(base.map(_._1)).take(100).map(id => (id, "delete")))
      .groupBy(_._1).map(_._2.head).toSeq // one op per id
    val changes = ops.map { case (id, op) =>
      val v = if (op == "delete") null
        else if (rnd.nextInt(5) == 0) null else word(rnd)
      val n: java.lang.Long = if (op == "delete") null
        else Long.box(rnd.nextInt(1000).toLong)
      (id, op, v, n)
    }
    val state = scala.collection.mutable.Map(
      base.map(b => b._1 -> ((Option(b._2), Option(b._3)))): _*)
    changes.foreach {
      case (id, "delete", _, _) => state.remove(id)
      case (id, _, v, n) => state(id) = ((Option(v), Option(n).map(_.toLong)))
    }
    val expect = state.toMap
    val got = graft.operators.Merge.applyChanges(
      base.toDF("id", "v", "n"), changes.toDF("id", "op", "v", "n"), "id")
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    assert(got == expect, s"merge drift: ${got.toSet.diff(expect.toSet)} / " +
      s"${expect.toSet.diff(got.toSet)}")
  }
}
