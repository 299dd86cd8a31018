package graft

import org.apache.spark.sql.functions._

import graft.dedup.DedupGroups

class DedupGroupsSpec extends SparkSpec {
  import spark.implicits._

  private def comps(pairs: Seq[(Long, Long)], maxIters: Int = 20) =
    DedupGroups.connectedComponents(pairs.toDF("a", "b"), "a", "b", maxIters)
      .as[(Long, Long)].collect().toMap

  test("chain, star, and disjoint components all resolve to min id") {
    val got = comps(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),   // chain -> comp 1
      (10L, 11L), (10L, 12L), (10L, 13L), // star -> comp 10
      (20L, 21L)))                     // pair -> comp 20
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("edge orientation does not matter; result is a unique fixpoint") {
    val a = comps(Seq((5L, 1L), (3L, 5L))) // reversed + shuffled orientations
    val b = comps(Seq((1L, 5L), (5L, 3L)))
    assert(a == b && a.values.toSet == Set(1L))
  }

  test("empty pair graph: empty components, canonicalize keeps everything") {
    assert(comps(Seq.empty) == Map.empty)
    val df = Seq(1L, 2L, 3L).toDF("doc_id")
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val kept = DedupGroups.canonicalize(df, none, "doc_id", "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
  }

  test("deep chain exhausts label propagation and auto-falls back to star") {
    // a 60-node path has diameter 59: label propagation at maxIters=3 can't
    // finish, so connectedComponents must hand off to the O(log n)-round
    // large-star/small-star formulation and still produce the exact result
    val chain = (1L to 59L).map(i => (i, i + 1))
    val got = comps(chain, maxIters = 3)
    assert(got.keySet == (1L to 60L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("connectedComponentsStar matches label propagation on cluster shapes") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (5L, 1L), (3L, 5L), // cycle-ish cluster
      (10L, 11L), (10L, 12L), (10L, 13L),               // star
      (20L, 21L))                                       // pair
    val lp = comps(pairs)
    val star = DedupGroups
      .connectedComponentsStar(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(star == lp)
  }

  test("connectedComponentsStar: empty graph and orientation invariance") {
    val empty = DedupGroups.connectedComponentsStar(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
    assert(empty.count() == 0)
    val fwd = DedupGroups.connectedComponentsStar(
      Seq((1L, 5L), (5L, 3L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val rev = DedupGroups.connectedComponentsStar(
      Seq((5L, 1L), (3L, 5L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(fwd == rev && fwd.values.toSet == Set(1L))
  }

  test("canonicalize keeps the min-id member per group plus singletons") {
    val df = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
      .withColumn("payload", col("doc_id") * 2)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = DedupGroups.canonicalize(df, pairs, "doc_id", "id_a", "id_b")
      .select("doc_id").as[Long].collect().toSet
    // 99 touches no pair and must survive untouched
    assert(kept == Set(1L, 10L, 99L))
  }

  test("canonicalizeBest keeps the max-score member (id tie-break), " +
    "singletons untouched") {
    val df = Seq(
      (1L, 10L), (2L, 30L), (3L, 20L), // group {1,2,3}: 2 wins on score
      (10L, 5L), (11L, 5L),            // group {10,11}: tie → min id 10
      (99L, 1L))                       // singleton: survives regardless
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val kept = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
      "id_a", "id_b", col("score"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 99L), s"got $kept")
  }

  test("crossSourceMatrix: canonical source order, unordered pairs " +
    "counted once") {
    val docs = Seq((1L, "web"), (2L, "books"), (3L, "web"), (4L, "code"))
      .toDF("doc_id", "source")
    // (web,books) twice — once in each orientation — plus (web,web)
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    val got = DedupGroups.crossSourceMatrix(pairs, docs, "doc_id", "source")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("n_pairs"))).toMap
    assert(got == Map(("books", "web") -> 2L, ("web", "web") -> 1L),
      s"got $got")
  }

  test("plan: label rounds are hash joins, never all-pairs") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assertNoCartesian(DedupGroups.connectedComponents(pairs, "a", "b"))
  }

  test("leakageSafeSplit: every member of a group lands in the SAME split") {
    val docs = (1L to 200L).toDF("doc_id")
    // chains of 4: (1,2,3,4), (5,6,7,8), ... — 50 groups
    val pairs = (1L to 200L).grouped(4).flatMap(g =>
      g.sliding(2).map(p => (p.head, p.last))).toSeq.toDF("id_a", "id_b")
    val out = DedupGroups.leakageSafeSplit(docs, pairs, "doc_id",
        "id_a", "id_b", testBp = 3000, valBp = 3000,
        graft.operators.Sampling.lcgBp)
      .as[(Long, Long, String)].collect()
    val byGroup = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byGroup.values.forall(_.size == 1),
      s"split straddles a group: ${byGroup.filter(_._2.size > 1).take(2)}")
    assert(out.map(_._3).toSet == Set("train", "val", "test"))
  }

  test("leakageSafeSplit: singletons are their own group, split by own id") {
    val docs = Seq(1L, 2L, 50L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = DedupGroups.leakageSafeSplit(docs, pairs, "doc_id",
        "id_a", "id_b", testBp = 1000, valBp = 1000,
        graft.operators.Sampling.lcgBp)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r._2).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 50L -> 50L))
  }

  test("triangleCensus: clique, star, and chain shapes") {
    def census(pairs: Seq[(Long, Long)]) =
      DedupGroups.triangleCensus(pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Long)].collect().head
    // K4 clique: 6 edges, 12 wedges, 4 triangles, clustering 10000
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(census(k4) == ((6L, 12L, 4L, 10000L)))
    // star on 5 leaves: 5 edges, 10 wedges, 0 triangles, clustering 0
    val star = (2L to 6L).map(i => (1L, i))
    assert(census(star) == ((5L, 10L, 0L, 0L)))
    // chain 1-2-3-4: 3 edges, 2 wedges, 0 triangles
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == ((3L, 2L, 0L, 0L)))
    // triangle + pendant: 4 edges, 5 wedges, 1 triangle -> 6000 bp
    assert(census(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))) ==
      ((4L, 5L, 1L, 6000L)))
  }

  test("triangleCensus: orientation/duplication of input edges is harmless") {
    val fwd = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val rev = Seq((2L, 1L), (3L, 2L), (3L, 1L), (1L, 2L)) // dups + flipped
    def census(pairs: Seq[(Long, Long)]) =
      DedupGroups.triangleCensus(pairs.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long, Long)].collect().head
    assert(census(fwd) == census(rev) && census(fwd)._3 == 1L)
  }

  test("dedupImpact counts agree with canonicalize, removed ids bounded") {
    // groups: {1,2,3} (src a,a,b), {10,11} (b,b); 20 is pair-free (src a)
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b"), (10L, "b"), (11L, "b"),
      (20L, "a")).toDF("doc_id", "source")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = DedupGroups.dedupImpact(docs, pairs, "doc_id", "id_a", "id_b",
        "source").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: docs {1,2,20}, removed {2} → (3,1,2,3333); b: {3,10,11}, removed
    // {3,11} → (3,2,1,6666)
    assert(got == Map("a" -> (3L, 1L, 2L, 3333L), "b" -> (3L, 2L, 1L, 6666L)),
      s"got $got")
    // kept totals must equal canonicalize's survivor count
    val kept = DedupGroups.canonicalize(docs, pairs, "doc_id", "id_a", "id_b")
      .count()
    assert(got.values.map(_._3).sum == kept)
  }

  test("leakageSafeSplit is deterministic across partitionings") {
    val docs = (1L to 120L).toDF("doc_id")
    val pairs = (1L to 60L).map(i => (i, i + 60L)).toDF("id_a", "id_b")
    def run(parts: Int) = DedupGroups.leakageSafeSplit(
        docs.repartition(parts), pairs.repartition(parts), "doc_id",
        "id_a", "id_b", testBp = 2000, valBp = 2000,
        graft.operators.Sampling.lcgBp)
      .as[(Long, Long, String)].collect().toSet
    assert(run(1) == run(16))
  }

  test("canonicalizeBest member join coerces numeric widths (int corpus " +
    "ids against the long pair graph, no hard cast)") {
    val df = Seq((1, 10L), (2, 99L), (3, 5L)).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val kept = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
        "id_a", "id_b", col("quality"))
      .select("doc_id").as[Int].collect().toSet
    assert(kept == Set(2, 3), s"got $kept")
  }

  test("canonicalize/canonicalizeBest: numeric-STRING corpus ids above " +
    "2^53 never coerce through double (exact id equality)") {
    // 9007199254740992 and ...93 are equal as doubles: an implicit
    // string=bigint comparison (PromoteStrings → double) would match BOTH
    // corpus rows to the pair id ...92, silently dropping the innocent
    // ...93 row. The decimal(38,0) join key keeps equality exact.
    val big = 9007199254740992L // 2^53
    val df = Seq((big.toString, 5L), ((big + 1).toString, 9L), ("100", 1L))
      .toDF("doc_id", "quality")
    val pairs = Seq((100L, big)).toDF("id_a", "id_b")
    val keptBest = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
        "id_a", "id_b", col("quality"))
      .select("doc_id").as[String].collect().toSet
    // group {100, 2^53}: 2^53 wins on quality; 2^53+1 is in NO pair and
    // must survive untouched
    assert(keptBest == Set(big.toString, (big + 1).toString), s"got $keptBest")
    val keptMin = DedupGroups.canonicalize(df, pairs, "doc_id",
        "id_a", "id_b")
      .select("doc_id").as[String].collect().toSet
    // min-id canonicalize keeps 100, drops exactly 2^53 — not its
    // double-equal neighbor
    assert(keptMin == Set("100", (big + 1).toString), s"got $keptMin")
  }

  test("canonicalizeBest score ties break on the pair graph's NUMERIC id " +
    "order, not the caller type's lexicographic order") {
    // string ids "9" and "10", equal score: numeric order keeps 9
    // (lexicographic would keep "10")
    val df = Seq(("9", 5L), ("10", 5L)).toDF("doc_id", "quality")
    val pairs = Seq((9L, 10L)).toDF("id_a", "id_b")
    val kept = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
        "id_a", "id_b", col("quality"))
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("9"), s"got $kept")
  }

  test("formatted numeric-string ids match their pair ids by VALUE " +
    "(zero-padded exports: \"007\" == 7L)") {
    // a caller-type cast of the graph id would compare "7" != "007" and
    // silently keep both members; the decimal join key compares values
    val df = Seq(("007", 1L), ("100", 9L)).toDF("doc_id", "quality")
    val pairs = Seq((7L, 100L)).toDF("id_a", "id_b")
    val keptBest = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
        "id_a", "id_b", col("quality"))
      .select("doc_id").as[String].collect().toSet
    assert(keptBest == Set("100"), s"got $keptBest")
    val keptMin = DedupGroups.canonicalize(df, pairs, "doc_id",
        "id_a", "id_b")
      .select("doc_id").as[String].collect().toSet
    // min-id rule: comp = 7, so "100" is the non-canonical member
    assert(keptMin == Set("007"), s"got $keptMin")
  }

  test("a non-numeric string id is a surviving singleton, not an ANSI " +
    "cast failure (try_cast in the cross-type join key)") {
    // "junk-id" can never appear in the numeric pair graph; it must ride
    // through both canonicalizers untouched — a plain decimal cast would
    // THROW under the session's ANSI mode
    val df = Seq(("junk-id", 1L), ("9", 5L), ("10", 3L))
      .toDF("doc_id", "quality")
    val pairs = Seq((9L, 10L)).toDF("id_a", "id_b")
    val keptMin = DedupGroups.canonicalize(df, pairs, "doc_id",
        "id_a", "id_b")
      .select("doc_id").as[String].collect().toSet
    assert(keptMin == Set("junk-id", "9"), s"got $keptMin")
    val keptBest = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
        "id_a", "id_b", col("quality"))
      .select("doc_id").as[String].collect().toSet
    assert(keptBest == Set("junk-id", "9"), s"got $keptBest")
  }

  test("a FRACTIONAL caller id never rounds onto a neighboring graph id " +
    "(7.5 must not match 8); integral doubles still match exactly") {
    // decimal(38,0) try_cast ROUNDS 7.5 → 8: without the integrality
    // screen, the 7.5 row would join the {8, 100} group and be silently
    // dropped. The contract is integral ids; a fractional one is inert —
    // it matches nothing and survives as its own singleton.
    val df = Seq((7.5d, 1L), (8.0d, 2L), (100.0d, 9L))
      .toDF("doc_id", "quality")
    val pairs = Seq((8L, 100L)).toDF("id_a", "id_b")
    val keptMin = DedupGroups.canonicalize(df, pairs, "doc_id",
        "id_a", "id_b")
      .select("doc_id").as[Double].collect().toSet
    // comp = 8: the 100.0 row drops; 8.0 (integral double) matches and
    // survives as canonical; 7.5 is untouched
    assert(keptMin == Set(7.5d, 8.0d), s"got $keptMin")
    val keptBest = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
        "id_a", "id_b", col("quality"))
      .select("doc_id").as[Double].collect().toSet
    // quality: 100.0 (9) beats 8.0 (2); 7.5 survives as a singleton
    assert(keptBest == Set(7.5d, 100.0d), s"got $keptBest")
  }

  test("a WIDE-DECIMAL fractional id (≥ 10²⁰, past the (38,18) probe's " +
    "range) still never rounds onto a neighboring graph id") {
    // the old fixed-scale probe try_cast'd decimal(38,1) 1e20 + 0.5 to
    // decimal(38,18) → overflow → NULL → fell through to the rounding
    // (38,0) key, which rounds it onto graph id 10²⁰ + 1; the native
    // c =!= floor(c) check on DecimalType is exact at any precision
    // built from strings: the tuple encoder would type a scala BigDecimal
    // as decimal(38,18), which these 21-integer-digit values overflow
    val df = Seq(("100000000000000000000.5", 1L),
        ("100000000000000000001.0", 2L), ("3.0", 9L))
      .toDF("doc_id", "quality")
      .select(col("doc_id").cast(
        org.apache.spark.sql.types.DecimalType(38, 1)).as("doc_id"),
        col("quality"))
    // pair graph carries the ids as decimal(38,0) — a type a 64-bit long
    // cannot hold, which is exactly when wide decimal caller ids arise
    val pairs = Seq(("100000000000000000001", "3"))
      .toDF("id_a", "id_b")
      .select(col("id_a").cast(org.apache.spark.sql.types.DecimalType(38, 0))
        .as("id_a"),
        col("id_b").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          .as("id_b"))
    val keptMin = DedupGroups.canonicalize(df, pairs, "doc_id",
        "id_a", "id_b")
      .select(col("doc_id").cast("string")).as[String].collect().toSet
    // comp = 3: wideInt (…001) drops, small (3) survives as canonical,
    // and the FRACTIONAL wide id is inert — it must NOT follow …001 out
    assert(keptMin == Set("100000000000000000000.5", "3.0"), s"got $keptMin")
  }

  test("canonicalizeBest: two value-equal representations of one id " +
    "(\"7\" and \"007\") share one fate — the group keeps its survivor") {
    // both strings value-match graph id 7; before the member collapse
    // the rank-2 duplicate row put 7 in the drop set and the anti-join
    // removed BOTH representations, losing the group's survivor
    val df = Seq(("7", 9L), ("007", 5L), ("100", 1L))
      .toDF("doc_id", "quality")
    val pairs = Seq((7L, 100L)).toDF("id_a", "id_b")
    val keptBest = DedupGroups.canonicalizeBest(df, pairs, "doc_id",
        "id_a", "id_b", col("quality"))
      .select("doc_id").as[String].collect().toSet
    // id 7's score is max(9, 5) = 9 > 1: it wins the group and BOTH its
    // representations survive; "100" drops
    assert(keptBest == Set("7", "007"), s"got $keptBest")
  }
}
