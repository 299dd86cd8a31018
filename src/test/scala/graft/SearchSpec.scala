package graft

import org.apache.spark.sql.functions._

import graft.search.{Bm25, Rrf}

/** BM25 retrieval + reciprocal-rank fusion invariants: relevance ordering,
  * tf saturation, length normalization, integer-exact fusion arithmetic,
  * and the no-all-pairs plan guard. */
class SearchSpec extends SparkSpec {

  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  /** True iff some file scan in the executed plan carries a pushed
    * In(token, …) filter — read from the scan node's own metadata map
    * rather than the whole plan's string rendering, which is at the
    * mercy of Spark's plan-format choices. AdaptiveSparkPlanExec is a
    * leaf to `collect`, so the helper recurses into its current plan
    * explicitly. */
  private def hasPushedTokenInFilter(
      df: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def pushed(p: SparkPlan): Seq[String] = p.collect {
      case a: AdaptiveSparkPlanExec => pushed(a.executedPlan)
      case s: FileSourceScanExec => s.metadata.get("PushedFilters").toSeq
    }.flatten
    pushed(df.queryExecution.executedPlan).exists(_.contains("In(token"))
  }

  /** Best-effort recursive delete for the spec's staged-parquet temp dirs
    * (children before parents via reverse-sorted walk). Runs in finally
    * blocks, so per-path failures are swallowed: a transiently
    * undeletable file (a late committer .crc write, say) must not
    * supersede a pending assertion error from the try body. */
  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    try {
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach((p: Path) =>
            try Files.deleteIfExists(p)
            catch { case _: java.io.IOException => () })
        finally walk.close()
      }
    } catch { case _: java.io.IOException => () }
  }

  test("BM25 ranks the rare-term match above common-term matches") {
    // "zyzzyva" appears in exactly one candidate; "the" is everywhere.
    val corpus = docsDf(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the zyzzyva beetle is a real the insect",
      3L -> "the the the the common words only here",
      4L -> "another document about the weather today")
    val queries = docsDf(100L -> "zyzzyva the")
    val top = Bm25.topK(corpus, "doc_id", "text",
      queries, "doc_id", "text", k = 4).collect()
    assert(top.head.getAs[Long]("doc_id") == 2L,
      s"rare-term doc should rank first: ${top.mkString(", ")}")
    assert(top.forall(_.getAs[Int]("rank") >= 1))
  }

  test("BM25 tf weighting saturates: 10x tf gives < 10x per-term score") {
    // same doc length (padding with distinct fillers), tf 1 vs tf 10
    val fill = (1 to 9).map(i => s"filler$i").mkString(" ")
    val corpus = docsDf(
      1L -> (Seq.fill(10)("needle").mkString(" ") + " pad"),
      2L -> (s"needle $fill pad"),
      3L -> "unrelated words entirely different topic")
    val queries = docsDf(100L -> "needle")
    val sc = Bm25.scoreAll(corpus, "doc_id", "text",
      queries, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_u"))
      .toMap
    assert(sc(1L) > sc(2L), "higher tf must still score higher")
    assert(sc(1L) < 10 * sc(2L),
      s"saturation: tf=10 score ${sc(1L)} must be < 10x tf=1 score ${sc(2L)}")
  }

  test("BM25 length normalization: same tf, shorter doc ranks higher") {
    val longTail = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = docsDf(
      1L -> s"needle $longTail",
      2L -> "needle short doc",
      3L -> "no match here at all")
    val queries = docsDf(100L -> "needle")
    val top = Bm25.topK(corpus, "doc_id", "text",
      queries, "doc_id", "text", k = 3).collect()
    assert(top.head.getAs[Long]("doc_id") == 2L,
      s"shorter doc with equal tf should rank first: ${top.mkString(", ")}")
  }

  test("BM25 excludes self-pairs and emits contiguous ranks") {
    val corpus = docsDf(
      0L -> "alpha beta gamma",
      1L -> "alpha beta delta",
      2L -> "alpha epsilon zeta")
    // query id 0 collides with corpus id 0 → self-pair must be excluded
    val top = Bm25.topK(corpus, "doc_id", "text",
      corpus.filter(col("doc_id") === 0), "doc_id", "text", k = 5).collect()
    assert(!top.exists(_.getAs[Long]("doc_id") == 0L), "self-pair leaked")
    assert(top.map(_.getAs[Int]("rank")).sorted.sameElements(1 to top.length),
      "ranks must be contiguous from 1")
  }

  test("BM25 probe plan has no cartesian; BNLJ only for 1-row stat attach") {
    val corpus = docsDf((0L until 20L).map(i =>
      i -> s"token$i shared common word${i % 5}"): _*)
    val df = Bm25.topK(corpus, "doc_id", "text",
      corpus.filter(col("doc_id") % 10 === 0), "doc_id", "text", k = 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"plan contains CartesianProduct:\n$plan")
    // the two BroadcastNestedLoopJoin nodes are the broadcast SINGLE-ROW
    // corpus-stats crossJoins (idf + scoring) — the Relational histogram
    // precedent, bounded build side by construction. Anything beyond those
    // two means a real join degenerated.
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"unexpected BNLJ count $bnlj (only the 1-row stats " +
      s"attaches are allowed):\n$plan")
  }

  test("impact-index probe == direct topK, through a real parquet " +
    "round-trip") {
    val corpus = docsDf((0L until 30L).map(i =>
      i -> s"doc $i talks about topic${i % 7} and shares common words"): _*)
    val queries = corpus.filter(col("doc_id") % 10 === 0)
    val direct = Bm25.topK(corpus, "doc_id", "text",
      queries, "doc_id", "text", k = 5)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_bm25_idx_spec").toString
    Bm25.buildImpactIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(idxDir)
    val probed = Bm25.searchIndex(spark.read.parquet(idxDir),
      queries, "doc_id", "text", k = 5)
    assert(probed.exceptAll(direct).isEmpty && direct.exceptAll(probed).isEmpty,
      "index probe must be score-identical to direct scoring")
    assert(direct.count() > 0)
  }

  test("long-query pruning: short queries are untouched; a long query " +
    "keeps exactly its rarest terms — scores equal the hand-pruned " +
    "query — and the index probe agrees with direct topK") {
    // dfs by construction: each rareN in ONE doc, common/filler in many
    val corpus = docsDf(
      1L -> "rarea common filler words here",
      2L -> "rareb common filler words here",
      3L -> "rarec common filler words here",
      4L -> "rared common filler words here",
      5L -> "raree common filler words here",
      6L -> "common filler words here extra",
      7L -> "common filler words here extra",
      8L -> "common filler words here extra")
    // 9 distinct terms; the 5 rarest are exactly rarea..raree
    val longQ = docsDf(
      100L -> "rarea rareb rarec rared raree common filler words extra")
    val pruned = Bm25.topK(corpus, "doc_id", "text",
      longQ, "doc_id", "text", k = 8, maxTermsPerQuery = 5)
    // the same ranking, spelled as an unpruned query over the kept set
    val handPruned = Bm25.topK(corpus, "doc_id", "text",
      docsDf(100L -> "rarea rareb rarec rared raree"), "doc_id", "text",
      k = 8)
    assert(pruned.exceptAll(handPruned).isEmpty &&
      handPruned.exceptAll(pruned).isEmpty,
      "pruned long query must score exactly its rarest-term subset")
    // a query at/below the cap is bit-identical to the unpruned operator
    val shortQ = docsDf(101L -> "rarea common filler")
    val a = Bm25.topK(corpus, "doc_id", "text", shortQ, "doc_id", "text",
      k = 8, maxTermsPerQuery = 5)
    val b = Bm25.topK(corpus, "doc_id", "text", shortQ, "doc_id", "text",
      k = 8)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "short queries must be untouched by the pruning cap")
    // corpus-side df ranking == index-side posting-count ranking: the
    // impact probe at the same cap is score-identical to direct topK
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_bm25_prune_spec").toString
    Bm25.buildImpactIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(idxDir)
    val probed = Bm25.searchIndex(spark.read.parquet(idxDir),
      longQ, "doc_id", "text", k = 8, maxTermsPerQuery = 5)
    assert(probed.exceptAll(pruned).isEmpty &&
      pruned.exceptAll(probed).isEmpty,
      "index probe must select the same pruned term sets as direct topK")
  }

  test("index probe pushes the query-term IN filter to the parquet scan") {
    val corpus = docsDf((0L until 30L).map(i =>
      i -> s"doc $i mentions term$i plus shared filler words here"): _*)
    val idxDir = java.nio.file.Files
      .createTempDirectory("graft_bm25_push_spec").toString
    Bm25.buildImpactIndex(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(idxDir)
    val plan = Bm25.searchIndex(spark.read.parquet(idxDir),
      docsDf(100L -> "term3 filler"), "doc_id", "text", k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(token"),
      s"query terms must reach the postings scan as a pushed filter:\n$plan")
  }

  test("staged index layout: token-sorted files with pairwise-disjoint " +
    "ranges, so the pushed IN filter can prune row groups") {
    val corpus = docsDf((0L until 60L).map(i =>
      i -> s"doc $i mentions term$i plus shared filler words here"): _*)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bm25_layout_spec").toString + "/idx"
    // the exact layout transform the q109 staging applies
    Bm25.buildImpactIndex(corpus, "doc_id", "text")
      .repartitionByRange(8, col("token"))
      .sortWithinPartitions("token")
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
    assert(files.size > 1, "layout write produced a single file")
    val ranges = files.map { f =>
      val toks = spark.read.parquet(f).select("token")
        .as[String].collect()
      assert(toks.toSeq == toks.toSeq.sorted, s"rows not token-sorted in $f")
      (toks.min, toks.max)
    }.sortBy(_._1)
    // pairwise-disjoint min/max windows: footer statistics actually
    // exclude out-of-range files for a selective token predicate
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file token ranges: $ranges")
      case _ =>
    }
    // and the probe over THIS layout still pushes the IN filter + matches
    // the direct scorer (the layout changes I/O, never results)
    val queries = corpus.filter(col("doc_id") % 20 === 0)
    val probed = Bm25.searchIndex(spark.read.parquet(dir),
      queries, "doc_id", "text", k = 5)
    assert(hasPushedTokenInFilter(probed))
    val direct = Bm25.topK(corpus, "doc_id", "text",
      queries, "doc_id", "text", k = 5)
    assert(probed.exceptAll(direct).isEmpty && direct.exceptAll(probed).isEmpty)
  }

  test("staged vocab overload: ranks bit-identical to the self-derived " +
    "df path, through a real parquet round-trip, in BOTH pruned branches") {
    val corpus = docsDf(
      1L -> "rarea common filler words here",
      2L -> "rareb common filler words here",
      3L -> "rarec common filler words here",
      4L -> "common filler words here extra",
      5L -> "common filler words here extra")
    val longQ = docsDf(100L -> "rarea rareb common filler words extra",
      101L -> "rarec common filler")
    val basePath = java.nio.file.Files
      .createTempDirectory("graft_bm25_vocab_spec")
    val base = basePath.toString
    try {
      // the exact staging the SparkEntry pair applies: vocab derived FROM
      // the index build, both parquet round-tripped
      Bm25.buildImpactIndex(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$base/idx")
      val idx = spark.read.parquet(s"$base/idx")
      Bm25.indexVocab(idx).write.mode("overwrite").parquet(s"$base/vocab")
      val vocab = spark.read.parquet(s"$base/vocab")
      val self = Bm25.searchIndex(idx, longQ, "doc_id", "text", k = 5,
        maxTermsPerQuery = 3)
      // branch 1: query vocabulary within the pushdown cap (the default)
      val staged = Bm25.searchIndex(idx, vocab, longQ, "doc_id", "text",
        k = 5, maxPushdownTerms = Bm25.DefaultMaxPushdownTerms,
        maxTermsPerQuery = 3,
        maxBroadcastQueryTerms = Bm25.DefaultMaxBroadcastQueryTerms)
      assert(staged.exceptAll(self).isEmpty && self.exceptAll(staged).isEmpty,
        "staged-vocab ranks must be bit-identical to the self-derived path")
      // branch 2: query vocabulary PAST the pushdown cap (semi-join
      // restriction instead of the pushed IN filter), vs the self-derived
      // path under the same cap
      val selfWide = Bm25.searchIndex(idx, longQ, "doc_id", "text", k = 5,
        maxPushdownTerms = 1, maxTermsPerQuery = 3)
      val stagedWide = Bm25.searchIndex(idx, vocab, longQ, "doc_id", "text",
        k = 5, maxPushdownTerms = 1, maxTermsPerQuery = 3,
        maxBroadcastQueryTerms = Bm25.DefaultMaxBroadcastQueryTerms)
      assert(stagedWide.exceptAll(selfWide).isEmpty &&
        selfWide.exceptAll(stagedWide).isEmpty,
        "past-pushdown-cap staged-vocab ranks must match the self-derived path")
      // and the vocab path must not have cost the index scan its pruning:
      // the pushed IN(token) filter still reaches the postings scan
      assert(hasPushedTokenInFilter(staged),
        "staged-vocab path must keep the pushed postings-scan filter")
    } finally deleteRecursively(basePath)
  }

  test("RRF fusion arithmetic is the exact integer sum of both lists") {
    val l1 = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 11L, 1), (1L, 12L, 2)).toDF("query_id", "doc_id", "rank")
    val fused = Rrf.fuse(Seq(l1, l2), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("rrf_u"), r.getAs[Long]("n_lists"), r.getAs[Int]("rank")))
      .toMap
    // doc 11: rank 2 in l1 + rank 1 in l2 = 1e6/62 + 1e6/61 = 16129+16393
    assert(fused(11L) == ((16129L + 16393L, 2L, 1)), s"got ${fused(11L)}")
    // doc 10: only l1 rank 1 = 1e6/61
    assert(fused(10L) == ((16393L, 1L, 2)), s"got ${fused(10L)}")
    // doc 12: only l2 rank 2 = 1e6/62
    assert(fused(12L) == ((16129L, 1L, 3)), s"got ${fused(12L)}")
  }

  test("RRF of a single list preserves that list's order") {
    val l = Seq((7L, 3L, 1), (7L, 9L, 2), (7L, 5L, 3))
      .toDF("query_id", "doc_id", "rank")
    val fused = Rrf.fuse(Seq(l), k = 3).orderBy("rank")
      .select("doc_id").as[Long].collect()
    assert(fused.sameElements(Array(3L, 9L, 5L)))
  }

  test("RRF consensus doc beats single-list docs at comparable ranks") {
    // doc 50 is rank 3 in BOTH lists; doc 60/61 are rank 1 in one list only.
    // 2/(60+3) > 1/(60+1) in RRF terms: consensus wins.
    val l1 = Seq((1L, 60L, 1), (1L, 70L, 2), (1L, 50L, 3))
      .toDF("query_id", "doc_id", "rank")
    val l2 = Seq((1L, 61L, 1), (1L, 71L, 2), (1L, 50L, 3))
      .toDF("query_id", "doc_id", "rank")
    val top = Rrf.fuse(Seq(l1, l2), k = 1).collect()
    assert(top.head.getAs[Long]("doc_id") == 50L,
      s"consensus doc should win: ${top.mkString(", ")}")
  }

  test("idfDelta: hand-computed shifts, vocabulary churn, tolerance gate") {
    val v1 = docsDf(1L -> "aa bb", 2L -> "aa")
    val v2 = docsDf(1L -> "aa bb", 2L -> "aa", 3L -> "aa cc")
    def idfU(n: Long, df: Long): Long =
      math.floor(math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * 1e6).toLong
    val all = Bm25.idfDelta(v1, v2, "doc_id", "text", minDeltaMicro = 0L)
      .collect().map(r => r.getString(0) -> r).toMap
    // aa: df 2/2 -> 3/3; bb: 1/2 -> 1/3; cc appears (df_a = 0, idf_a NULL)
    assert(all("aa").getLong(1) == 2L && all("aa").getLong(2) == 3L)
    assert(all("aa").getLong(5) ==
      math.abs(idfU(2, 2) - idfU(3, 3)), s"got ${all("aa")}")
    assert(all("bb").getLong(5) == math.abs(idfU(2, 1) - idfU(3, 1)))
    assert(all("cc").getLong(1) == 0L && all("cc").isNullAt(3) &&
      all("cc").isNullAt(5), s"got ${all("cc")}")
    // a vanished token is always reported, whatever the tolerance
    val gone = Bm25.idfDelta(docsDf(1L -> "aa xx"), docsDf(1L -> "aa"),
      "doc_id", "text", minDeltaMicro = Long.MaxValue).collect()
    assert(gone.map(_.getString(0)).toSet == Set("xx"))
  }

  test("idfDelta of identical corpora under tolerance is empty") {
    val c = docsDf(1L -> "aa bb cc", 2L -> "aa dd")
    assert(Bm25.idfDelta(c, docsDf(1L -> "aa bb cc", 2L -> "aa dd"),
      "doc_id", "text", minDeltaMicro = 1L).count() == 0L)
  }

  test("overlapAtK: exact intersections per query, zero-overlap " +
    "queries kept, rank cap respected") {
    import spark.implicits._
    import graft.search.Rrf
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (3L, 30L, 1)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 99L, 2), (1L, 12L, 5),
      (2L, 21L, 1)).toDF("query_id", "doc_id", "rank")
    val got = Rrf.overlapAtK(a, b, k = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // k=2 caps: a1={10,11}, b1={11,99} → common {11}; q2 disjoint; q3
    // only in a → 0
    assert(got == Map(1L -> ((1L, 5000L)), 2L -> ((0L, 0L)),
      3L -> ((0L, 0L))), got.toString)
  }

  test("count-then-cap: an over-cap query set degrades every query-side " +
    "join to a shuffle with identical rows (topK and searchIndex)") {
    val corpus = docsDf(
      1L -> "alpha beta gamma delta common",
      2L -> "alpha alpha beta zeta common",
      3L -> "gamma epsilon eta theta common",
      4L -> "delta beta iota kappa lambda")
    val queries = docsDf(
      100L -> "alpha gamma kappa", 101L -> "beta delta common eta")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_u"),
        r.getAs[Int]("rank"))).toSet
    // threshold -1 isolates the HINT: any remaining BroadcastHashJoin is
    // one this operator asked for, and the over-cap regime must ask for
    // none (AQE may still upgrade at runtime from actual sizes — that is
    // executor-side and safe; the guard only removes the driver-forced
    // broadcast)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val bc = Bm25.topK(corpus, "doc_id", "text",
        queries, "doc_id", "text", k = 4)
      val sh = Bm25.topK(corpus, "doc_id", "text",
        queries, "doc_id", "text", k = 4, maxBroadcastQueryTerms = 0L)
      val bcPlan = bc.queryExecution.executedPlan.toString
      val shPlan = sh.queryExecution.executedPlan.toString
      assert(bcPlan.contains("BroadcastHashJoin"),
        s"under-cap probe must broadcast the query terms:\n$bcPlan")
      assert(!shPlan.contains("BroadcastHashJoin"),
        s"over-cap regime must not driver-broadcast anything:\n$shPlan")
      assert(shPlan.contains("SortMergeJoin") ||
        shPlan.contains("ShuffledHashJoin"),
        s"over-cap probe should be a shuffle join:\n$shPlan")
      assert(rows(bc) == rows(sh), "broadcast and shuffle regimes differ")
      // the impact-index probe, both with the long-query pruner engaged
      val idxDir = java.nio.file.Files
        .createTempDirectory("bm25guard").toString
      Bm25.buildImpactIndex(corpus, "doc_id", "text")
        .write.mode("overwrite").parquet(idxDir)
      val idx = spark.read.parquet(idxDir)
      val ibc = Bm25.searchIndex(idx, queries, "doc_id", "text", k = 4,
        maxTermsPerQuery = 2)
      val ish = Bm25.searchIndex(idx, queries, "doc_id", "text", k = 4,
        maxTermsPerQuery = 2, maxBroadcastQueryTerms = 0L)
      val ishPlan = ish.queryExecution.executedPlan.toString
      assert(!ishPlan.contains("BroadcastHashJoin"),
        s"over-cap index probe must not driver-broadcast:\n$ishPlan")
      assert(rows(ibc) == rows(ish),
        "index-probe broadcast and shuffle regimes differ")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
