package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage

class RecordLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def shaped(rows: Seq[(Long, String)]) =
    RecordLinkage.shape(rows.toDF("id", "s"), "id",
      expr("substring(s, 1, 2)"), "s")

  test("linkBlocked finds within-block pairs up to maxDist, with exact dist") {
    val clean = shaped(Seq(
      (1L, "ab-1234"), (2L, "ab-9999"), (3L, "cd-5678")))
    val dirty = shaped(Seq(
      (10L, "ab-1239"),   // 1 sub from id 1
      (11L, "ab-124"),    // 1 del from id 1 (and 2 edits from "ab-9999")
      (12L, "cd-5678"),   // exact copy of id 3
      (13L, "cd-0000")))  // 4 subs from id 3: out of budget
    val got = RecordLinkage.linkBlocked(clean, dirty, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (3L, 12L, 0L)))
  }

  test("an edit inside the blocking prefix is missed — the documented trade") {
    val clean = shaped(Seq((1L, "ab-1234")))
    val dirty = shaped(Seq((20L, "zb-1234"))) // dist 1, but block zb ≠ ab
    assert(RecordLinkage.linkBlocked(clean, dirty, maxDist = 1).isEmpty)
  }

  test("selfLinkBlocked emits each unordered pair once, never self pairs") {
    val t = shaped(Seq(
      (1L, "ab-1234"), (2L, "ab-1235"), (3L, "ab-1234"), (4L, "ab-77777")))
    val got = RecordLinkage.selfLinkBlocked(t, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) sub, (1,3) exact, (2,3) sub; 4 is 3+ edits from all
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 0L), (2L, 3L, 1L)))
  }

  test("plan is a hash equi-join on the block key, never all-pairs") {
    val d = sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr("substring(text, 1, 24)").as("rec"))
    val shapedDocs = RecordLinkage.shape(d, "doc_id",
      expr("substring(rec, 1, 4)"), "rec")
    val out = RecordLinkage.linkBlocked(shapedDocs, shapedDocs, maxDist = 1)
    assertNoCartesian(out)
    // every record matches at least itself at dist 0
    assert(out.filter(col("id_l") === col("id_r") && col("dist") === 0)
      .count() == d.count())
  }

  test("maxBlockPairs fail-fast: a saturated block dies loudly before " +
    "pair verification; under-cap results are invariant to the cap") {
    val left = shaped((1L to 40L).map(i => (i, f"ab-$i%04d")))
    val right = shaped((101L to 140L).map(i => (i, f"ab-${i - 100}%04d")))
    // 40 x 40 = 1600 pairs in block "ab": a cap of 1599 must trip with
    // the block named, and the trip must precede the Levenshtein stage
    val e = intercept[Exception] {
      RecordLinkage.linkBlocked(left, right, maxDist = 1,
        maxBlockPairs = 1599L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("linkBlocked") &&
      m.contains("'ab'") && m.contains("40 x 40")), msgs(e).mkString("|"))
    // the cap is strategy, not semantics: rows at a generous cap equal
    // rows at the exact boundary (1600 pairs == cap: no trip)
    def rows(cap: Long) =
      RecordLinkage.linkBlocked(left, right, maxDist = 1,
        maxBlockPairs = cap).as[(Long, Long, Long)].collect().toSet
    assert(rows(1600L) == rows(Long.MaxValue))
    assert(rows(1600L).nonEmpty)
  }

  test("NULL-block populations never trip the pair-volume guard (null " +
    "keys make zero pairs) and never pair") {
    // 60 x 60 null-block "pairs" on both sides would exceed a cap of
    // 1000 — but a null key never matches in the equi-join, so the guard
    // must not count them (groupBy would otherwise aggregate nulls as a
    // block); the real block 'ab' must still link normally
    val nullS = lit(null).cast("string")
    def withNulls(rows: Seq[(Long, String)]) =
      RecordLinkage.shape(rows.toDF("id", "s"), "id",
        when(col("s").startsWith("zz"), nullS)
          .otherwise(expr("substring(s, 1, 2)")), "s")
    val left = withNulls(
      (1L to 60L).map(i => (i, f"zz-$i%04d")) :+ (990L, "ab-0001"))
    val right = withNulls(
      (101L to 160L).map(i => (i, f"zz-${i - 100}%04d")) :+ (991L, "ab-0002"))
    val out = RecordLinkage.linkBlocked(left, right, maxDist = 1,
        maxBlockPairs = 1000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(out == Set((990L, 991L, 1L)), s"got $out")
  }

  test("incrementalLink: batch probes the index AND itself; new-vs-new " +
    "pairs carry the larger id as new_id") {
    val index = shaped(Seq((1L, "ab-1234"), (2L, "cd-5678")))
    val batch = shaped(Seq(
      (10L, "ab-1235"),   // 1 sub from master 1
      (11L, "ab-1236"),   // 1 sub from master 1 AND from 10
      (12L, "xy-0000")))  // matches nothing
    val got = RecordLinkage.incrementalLink(index, batch, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (10L, 1L, 1L), (11L, 1L, 1L), // vs index
      (11L, 10L, 1L)))              // within batch, larger id is new
  }

  test("incrementalLink round-trips through a parquet-persisted index") {
    val dir = java.nio.file.Files.createTempDirectory("reclink").toString
    shaped(Seq((1L, "ab-1234"), (2L, "cd-5678")))
      .write.mode("overwrite").parquet(dir)
    val got = RecordLinkage.incrementalLink(spark.read.parquet(dir),
        shaped(Seq((10L, "cd-5679"))), maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 2L, 1L)))
  }

  test("length guard and thresholded distance never drop a true match") {
    // strings whose length differs by exactly maxDist still verify
    val clean = shaped(Seq((1L, "ab-12")))
    val dirty = shaped(Seq((2L, "ab-123"), (3L, "ab-1234")))
    val got = RecordLinkage.linkBlocked(clean, dirty, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L))) // +2 chars is past both guards
  }

  test("sortedNeighborhood: exact within-w rank pairs incl. cross-" +
    "prefix-bucket and cross-block partners; equals the naive rank " +
    "formulation") {
    import spark.implicits._
    import graft.operators.RecordLinkage
    val rows = Seq((1L, "aa1"), (2L, "aa2"), (3L, "ab1"), (4L, "ab2"),
      (5L, "ba1"), (6L, "bb1"), (7L, "bb2"))
    val df = rows.toDF("id", "k").repartition(3)
    // tiny blockSize forces partners into adjacent blocks
    val got = RecordLinkage.sortedNeighborhood(df, "id", "k",
      w = 2, blockSize = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val ranked = rows.sortBy(r => (r._2, r._1)).map(_._1).zipWithIndex
    val want = (for {
      (a, ra) <- ranked; (b, rb) <- ranked
      if rb > ra && rb - ra <= 2
    } yield (a, b, (rb - ra).toLong)).toSet
    assert(got == want, s"got=${got.size} want=${want.size}")
    // the near-sorted neighbors a prefix block would MISS still pair:
    // aa2 (rank 1) with ab1 (rank 2) cross the aa/ab prefix boundary
    assert(got.contains((2L, 3L, 1L)))
  }
}
