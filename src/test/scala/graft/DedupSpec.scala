package graft

import org.apache.spark.sql.functions._

import graft.dedup.{ExactDedup, MinHashDedup, NGramJaccard, SimHash}
import graft.functions.TextFunctions

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // two exact dups, one near-dup pair, two unrelated docs
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy dog again and again today"),
    (4L, "completely different content about distributed query engines"),
    (5L, "spark catalyst optimizer rewrites logical plans into physical plans")
  ).toDF("id", "text")

  test("keepFirst keeps the min-order row per key, deterministically") {
    val df = Seq((1L, "a", 10), (2L, "a", 5), (3L, "b", 7)).toDF("id", "k", "v")
    val out = ExactDedup.keepFirst(df, Seq("k"), "id")
      .orderBy("id").select("id").as[Long].collect().toSeq
    assert(out == Seq(1L, 3L))
  }

  test("keepFirstAgg equals keepFirst; plan is partial-agg, not a window sort") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val win = ExactDedup.keepFirst(docs, Seq("text"), "doc_id")
      .orderBy("doc_id").collect().toSeq
    val agg = ExactDedup.keepFirstAgg(docs, Seq("text"), "doc_id")
    val out = agg.orderBy("doc_id").collect().toSeq
    assert(out == win, s"agg path diverged: ${out.size} vs ${win.size} rows")
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"keepFirstAgg must not window-sort:\n$plan")
    // partial (map-side) + final aggregate pair — the shape that shrinks the
    // shuffle to one candidate row per key per partition
    assert("(?i)aggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
  }

  test("dupCounts reports only groups with >1 row") {
    val out = ExactDedup.dupCounts(corpus, Seq("text")).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L)
  }

  test("minhash near-duplicates finds exact and near dups, skips unrelated") {
    val pairs = MinHashDedup.nearDuplicates(corpus, "id", "text",
      threshold = 0.5).collect()
    val ids = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)), s"missed exact dup in $ids")
    // exact dup pair has jaccard 1.0
    val j12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
      .getDouble(2)
    assert(j12 == 1.0)
    // unrelated docs (4, 5) share no shingles with anything -> never pair
    assert(ids.forall { case (a, b) =>
      Set(1L, 2L, 3L).contains(a) && Set(1L, 2L, 3L).contains(b) }, ids.toString)
  }

  test("minhash signature approximates exact jaccard (recall on dup pair)") {
    // identical docs must collide in every band
    val cand = MinHashDedup.candidatePairs(corpus, "id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)))
  }

  test("minhash/banded plan has no all-pairs join") {
    assertNoCartesian(MinHashDedup.nearDuplicates(corpus, "id", "text", 0.5))
  }

  test("simhash: identical docs get identical fingerprints, near-dups close") {
    val sig = SimHash.signatures(corpus, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(1L) == sig(2L))
    val d13 = java.lang.Long.bitCount(sig(1L) ^ sig(3L))
    val d14 = java.lang.Long.bitCount(sig(1L) ^ sig(4L))
    assert(d13 < d14, s"near-dup distance $d13 not < unrelated $d14")
  }

  test("simhash native, aggregate, and HOF formulations all agree") {
    val th = corpus.select(col("id"),
      transform(TextFunctions.tokens(col("text")), t => xxhash64(t)).as("th"))
    val ref = th.select(col("id"), SimHash.simhash64(col("th")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val native = SimHash.signatures(corpus, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = SimHash.signaturesAgg(corpus, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ref == native)
    assert(ref == agg)
  }

  test("simhash nearDuplicates finds identical pair; plan is bucketed") {
    val nd = SimHash.nearDuplicates(corpus, "id", "text", maxHamming = 3)
    val ids = nd.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ids.contains((1L, 2L)))
    assertNoCartesian(nd)
  }

  test("simhash multi-probe is complete to radius 7 (vs local brute force)") {
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir).limit(200)
    val sigs = SimHash.signatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val expect = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 7
    } yield (ia, ib)).toSet
    val got = SimHash.nearDuplicatesMultiProbe(docs, "doc_id", "text", 7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)} " +
        s"(${expect.size} expected, ${got.size} got)")
    assertNoCartesian(SimHash.nearDuplicatesMultiProbe(docs, "doc_id", "text", 7))
  }

  test("ngram jaccard: exact values, ordered pairs, no all-pairs plan") {
    val out = NGramJaccard.similarPairs(corpus, "id", "text", n = 3,
      threshold = 0.3)
    val rows = out.collect()
    val m = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 2L)) == 1.0)
    // doc 1: 12 tokens -> 10 distinct trigrams; doc 3 appends one token ->
    // those 10 plus (and again today); jaccard = |A∩B|/|A∪B| = 10/11
    assert(math.abs(m((1L, 3L)) - 10.0 / 11.0) < 1e-9, s"got ${m((1L, 3L))}")
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    assertNoCartesian(out)
  }

  test("ngram jaccard hot-shingle cap drops stopword-like grams") {
    // 30 docs all sharing one hot trigram + unique tails; cap at 10
    val docs = (1 to 30).map(i =>
      (i.toLong, s"common shared prefix unique$i tail$i word$i")).toDF("id", "text")
    val out = NGramJaccard.similarPairs(docs, "id", "text", n = 3,
      threshold = 0.1, maxDf = 10)
    // the only shared trigram is hot -> capped -> no candidate survives
    assert(out.count() == 0)
  }

  test("thresholdSweep: pairs land in their jaccard bands with exact " +
    "counts, affected docs, and cumulative-≥ totals") {
    // corpus fixture: (1,2) exact dup (band 10), (1,3)/(2,3) at 10/11
    // (band 9); all other pairs below the 0.5 floor
    val out = NGramJaccard.thresholdSweep(corpus, "id", "text",
      n = 3, minThreshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out == Map(
      10L -> ((1L, 2L, 1L)),   // pair (1,2); docs {1,2}; cum 1
      9L -> ((2L, 3L, 3L))),   // pairs (1,3),(2,3); docs {1,2,3}; cum 3
      out.toString)
  }

  test("incremental dedup finds cross-batch and within-batch dups from the index") {
    // corpus = docs 1-5; increment replays doc 1's text (id 11), a near-dup
    // of doc 3 (id 13), a within-increment dup pair (21, 22), and a fresh doc
    val increment = Seq(
      (11L, "the quick brown fox jumps over the lazy dog again and again"),
      (13L, "the quick brown fox jumps over the lazy dog again and again today"),
      (21L, "entirely novel increment content arriving in todays batch yes"),
      (22L, "entirely novel increment content arriving in todays batch yes"),
      (30L, "nothing like anything indexed before at all whatsoever")
    ).toDF("id", "text")
    val corpusSets = MinHashDedup.shingleSets(corpus, "id", "text", 3)
    val out = MinHashDedup.incrementalNearDups(increment, "id", "text",
      MinHashDedup.bandIndex(corpusSets), corpusSets, threshold = 0.8)
    val pairs = out.select("new_id", "dup_id").as[(Long, Long)]
      .collect().toSet
    // 11 matches both exact dups 1 and 2; 13 matches 3 (and 1/2 at 10/11)
    assert(pairs.contains((11L, 1L)) && pairs.contains((11L, 2L)))
    assert(pairs.contains((13L, 3L)))
    assert(pairs.contains((22L, 21L)), "within-increment dup missed")
    assert(!pairs.exists(_._1 == 30L), "fresh doc flagged")
    // dup side is always corpus or an earlier increment id
    pairs.foreach { case (n, d) => assert(d < n) }
    assertNoCartesian(out)
  }

  test("two-day ingest loop: append day-1 signatures, day-2 probe sees " +
    "day-1 docs") {
    import graft.dedup.SimHash
    // day 0: corpus signed into a persisted index table
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_ingest_loop_spec").toString
    val sig = (c: org.apache.spark.sql.DataFrame) =>
      SimHash.signatures(c, "id", "text")
    SimHash.appendToIndex(sig(corpus), idxDir)
    // day 1: fresh docs probe (no dups), then COMMIT them to the index
    val day1 = Seq(
      (101L, "day one document about completely novel subject matter here"),
      (102L, "another fresh day one document on a different novel topic"))
      .toDF("id", "text")
    val p1 = SimHash.incrementalNearDups(
      spark.read.parquet(idxDir), sig(day1))
    // both fresh docs are novel and distinct: NO pairs at all — an
    // id-range check would be vacuous for the cross-batch leg (corpus
    // dup_ids are < 100 by construction)
    assert(p1.count() == 0, s"day-1 probe must be clean: ${p1.collect().toSeq}")
    SimHash.appendToIndex(sig(day1), idxDir)
    // day 2: a re-upload of a DAY-1 doc must now hit the index
    val day2 = Seq(
      (201L, "day one document about completely novel subject matter here"))
      .toDF("id", "text")
    val p2 = SimHash.incrementalNearDups(
      spark.read.parquet(idxDir), sig(day2))
      .select("new_id", "dup_id").as[(Long, Long)].collect().toSet
    assert(p2.contains((201L, 101L)),
      s"day-2 probe must see the committed day-1 doc: $p2")
  }

  test("incremental dedup probes the corpus index without shuffling it") {
    val corpusSets = MinHashDedup.shingleSets(corpus, "id", "text", 3)
    val increment = Seq((11L, "the quick brown fox jumps over the lazy " +
      "dog again and again")).toDF("id", "text")
    val out = MinHashDedup.incrementalNearDups(increment, "id", "text",
      MinHashDedup.bandIndex(corpusSets), corpusSets, threshold = 0.8)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"increment not broadcast onto the index:\n$plan")
  }

  test("compactIndex: newest generation wins, tombstones drop, ties break high") {
    // id 1 re-signed (gen 1 beats gen 0), id 2 tombstoned, id 3 has a
    // double-appended (id, gen) pair (max simhash wins — deterministic),
    // id 4 untouched
    val idx = Seq((1L, 10L, 0L), (1L, 20L, 1L), (2L, 5L, 0L),
      (3L, 7L, 0L), (3L, 9L, 0L), (4L, 3L, 0L))
      .toDF("id", "simhash", "gen")
    val tomb = Seq(Tuple1(2L)).toDF("id")
    val got = SimHash.compactIndex(idx, tomb)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 20L, 3L -> 9L, 4L -> 3L), s"got $got")
    // maintenance must stay a partial-agg + broadcast-anti shape
    val plan = SimHash.compactIndex(idx, tomb).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Window"), s"compaction must not window:\n$plan")
    assert("(?i)aggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"tombstones must broadcast-anti:\n$plan")
    assertNoCartesian(SimHash.compactIndex(idx, tomb))
  }

  test("compactIndex output probes identically to a fresh index") {
    // compacted (id, simhash) is the exact schema the incremental probe
    // reads — the compaction job slots into the loop with no adapter
    val idx = Seq((1L, 0x1234L, 0L), (1L, 0x5678L, 1L)).toDF("id", "simhash", "gen")
    val compacted = SimHash.compactIndex(idx, Seq.empty[Long].map(Tuple1(_)).toDF("id"))
    val probe = Seq((100L, 0x5678L)).toDF("id", "simhash")
    val pairs = SimHash.nearDuplicatesAgainstIndex(compacted, probe, maxHamming = 0)
      .select("new_id", "dup_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((100L, 1L)), s"got $pairs")
  }

  test("duplicationSpectrum: planted copy counts land in the right buckets") {
    // 4 singleton texts, one text ×3, one text ×2 →
    // spectrum {1→4, 2→1, 3→1}; plus two NULL texts forming one group ×2
    val df = (Seq.fill(3)("thrice") ++ Seq.fill(2)("twice") ++
      Seq("a", "b", "c", "d")).map(Tuple1(_)).toDF("text")
      .unionByName(Seq(Tuple1(null: String), Tuple1(null: String))
        .toDF("text"))
    val got = ExactDedup.duplicationSpectrum(df, "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 4L, 2L -> 2L, 3L -> 1L), s"got $got")
  }

  test("dupWeights: every copy kept, weights split the group's mass") {
    import spark.implicits._
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "unique one")).toDF("id", "text")
    val got = graft.dedup.ExactDedup.dupWeights(docs, "id", "text")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3L, 3333L)) && got(2L) == got(1L) && got(3L) == got(1L))
    assert(got(4L) == ((1L, 10000L)))
    assert(got.size == 4)
  }
}
