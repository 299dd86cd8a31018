package graft

import graft.operators.SampleIndex

class SampleIndexSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], seqLen: Int, parts: Int = 1) =
    SampleIndex.plan(rows.toDF("id", "n").repartition(parts),
      "id", "n", seqLen)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("plan survives a wide INT id span (the native bucket multiply " +
    "would overflow past 2^31/nBuckets and scramble global offsets)") {
    // ids spread over ~2.1e9: (id - i0) * 256 overflows Int — the
    // decimal bucket math must keep offsets exact and coverage lossless
    val rows = Seq((java.lang.Integer.MIN_VALUE + 10, 5L),
      (0, 3L), (java.lang.Integer.MAX_VALUE - 10, 10L))
    val got = SampleIndex.plan(rows.toDF("id", "n"), "id", "n", 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3)))
      .toSet
    assert(got == Set(
      (0L, Int.MinValue + 10, 0L, 4L), (1L, Int.MinValue + 10, 4L, 1L),
      (1L, 0, 0L, 3L),
      (2L, Int.MaxValue - 10, 0L, 4L), (3L, Int.MaxValue - 10, 4L, 4L),
      (4L, Int.MaxValue - 10, 8L, 2L)), got.toString)
  }

  test("hand layout: docs split across samples, offsets and lengths exact") {
    // L=4; offsets: d1@0 (5 toks), d2@5 (3), d3@8 (10); 18 tokens total
    val got = run(Seq((1L, 5L), (2L, 3L), (3L, 10L)), seqLen = 4)
    assert(got == Set(
      (0L, 1L, 0L, 4L), (1L, 1L, 4L, 1L),   // d1 fills s0, spills 1 into s1
      (1L, 2L, 0L, 3L),                      // d2 completes s1
      (2L, 3L, 0L, 4L), (3L, 3L, 4L, 4L), (4L, 3L, 8L, 2L)), got.toString)
  }

  test("every sample except the last is exactly full; doc coverage is " +
    "lossless (segments per doc sum to n_tok)") {
    val rows = (1 to 200).map(i => (i.toLong, (i % 37 + 1).toLong))
    val got = run(rows, seqLen = 64, parts = 7).toSeq
    val bySample = got.groupBy(_._1).view.mapValues(_.map(_._4).sum).toMap
    val last = bySample.keys.max
    bySample.foreach { case (s, tot) =>
      if (s < last) assert(tot == 64L, s"sample $s holds $tot tokens")
    }
    assert(bySample(last) <= 64L && bySample(last) >= 1L)
    val byDoc = got.groupBy(_._2).view.mapValues(_.map(_._4).sum).toMap
    rows.foreach { case (id, n) => assert(byDoc(id) == n, s"doc $id") }
    // total conservation
    assert(got.map(_._4).sum == rows.map(_._2).sum)
  }

  test("segments within a doc are contiguous from offset 0 and " +
    "partitioning-invariant") {
    val rows = (1 to 50).map(i => (i.toLong, (i * 7 % 23 + 1).toLong))
    val a = run(rows, seqLen = 16, parts = 1)
    val b = run(rows, seqLen = 16, parts = 9)
    assert(a == b)
    a.groupBy(_._2).foreach { case (_, segs) =>
      val sorted = segs.toSeq.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq((_, _, o1, l1), (_, _, o2, _)) => assert(o1 + l1 == o2)
        case _ =>
      }
    }
  }

  test("empty docs are excluded; a doc shorter than L stays one segment") {
    val got = run(Seq((1L, 0L), (2L, 3L)), seqLen = 8)
    assert(got == Set((0L, 2L, 0L, 3L)), got.toString)
  }

  test("truncationLoss: hand indicator sums and integer bp") {
    val df = Seq(("a", 10L), ("a", 3L), ("b", 5L)).toDF("src", "n")
    val got = SampleIndex.truncationLoss(df, "src", "n", Seq(4, 8))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    assert(got(("a", 4L)) == ((2L, 1L, 13L, 6L, 4615L)), got.toString)
    assert(got(("a", 8L)) == ((2L, 1L, 13L, 2L, 1538L)))
    assert(got(("b", 4L)) == ((1L, 1L, 5L, 1L, 2000L)))
    assert(got(("b", 8L)) == ((1L, 0L, 5L, 0L, 0L)))
  }

  test("truncationLoss rejects empty/non-positive length lists") {
    val df = Seq(("a", 1L)).toDF("src", "n")
    intercept[IllegalArgumentException] {
      SampleIndex.truncationLoss(df, "src", "n", Nil)
    }
    intercept[IllegalArgumentException] {
      SampleIndex.truncationLoss(df, "src", "n", Seq(4, 0))
    }
  }
}
