package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def plan(rows: Seq[(Long, Long)], seqLen: Int, nBuckets: Int) =
    Packing.planPacking(rows.toDF("id", "n"), "id", "n", seqLen, nBuckets)
      .select("id", "bucket", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

  test("concat-and-chunk layout exact on one bucket") {
    // tokens 100,300,200,50 into seqLen=256: offsets 0,100,144,88(bin 2)
    val got = plan(Seq((0L, 100L), (8L, 300L), (16L, 200L), (24L, 50L)),
      seqLen = 256, nBuckets = 1)
    assert(got.map(r => (r._3, r._4)).toSeq ==
      Seq((0L, 0L), (0L, 100L), (1L, 144L), (2L, 88L)))
  }

  test("buckets pack independently and offsets stay inside a sequence") {
    val rows = (0L until 100L).map(i => (i, (i % 7) * 37 + 1))
    val got = plan(rows, seqLen = 128, nBuckets = 4)
    assert(got.forall(r => r._4 >= 0 && r._4 < 128))
    assert(got.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // within a bucket, (bin, offset) is strictly increasing in id order
    got.groupBy(_._2).foreach { case (_, rs) =>
      val pos = rs.sortBy(_._1).map(r => r._3 * 128 + r._4)
      assert(pos.zip(pos.tail).forall { case (a, b) => a < b })
    }
  }

  test("duplicate ids within a bucket still conserve tokens (ROWS frame)") {
    // the default RANGE frame would give both peer rows the same
    // peer-inclusive sum (offsets {200, 200}, tokens 0-99 orphaned)
    val got = Packing.planPacking(
        Seq((8L, 100L), (8L, 100L), (16L, 50L)).toDF("id", "n"),
        "id", "n", seqLen = 256, nBuckets = 1)
      .select("bin", "offset").as[(Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq((0L, 0L), (0L, 100L), (0L, 200L)))
  }

  test("token conservation: next doc starts where the previous ended") {
    val rows = Seq((0L, 100L), (1L, 200L), (2L, 300L))
    val got = Packing.planPacking(rows.toDF("id", "n"), "id", "n", 512, 1)
      .select("id", "n", "bin", "offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    got.zip(got.tail).foreach { case ((_, n, b, o), (_, _, b2, o2)) =>
      assert(b2 * 512 + o2 == b * 512 + o + n)
    }
  }

  test("auditPacking: hand-computed waste, fill and split counts") {
    // seqLen 10, one bucket, tokens 4,5,3,9,0: bins hold 10+10+1 of 21
    // tokens; docs 3 (off 9 + 3) and 4 (off 2 + 9) cross one boundary each
    val plan = Packing.planPacking(
      Seq((0L, 4L), (1L, 5L), (2L, 3L), (3L, 9L), (4L, 0L)).toDF("id", "n"),
      "id", "n", seqLen = 10, nBuckets = 1)
    val r = Packing.auditPacking(plan, "n", seqLen = 10).head()
    val m = r.getValuesMap[Any](Seq("n_docs", "total_tokens", "n_bins",
      "tail_waste", "fill_bp", "split_docs", "splits"))
    assert(m == Map("n_docs" -> 5L, "total_tokens" -> 21L, "n_bins" -> 3L,
      "tail_waste" -> 9L, "fill_bp" -> 7000L, "split_docs" -> 2L,
      "splits" -> 2L), s"got $m")
  }

  test("auditPacking: a doc spanning several sequences counts every crossing") {
    val plan = Packing.planPacking(Seq((0L, 25L)).toDF("id", "n"),
      "id", "n", seqLen = 10, nBuckets = 1)
    val r = Packing.auditPacking(plan, "n", seqLen = 10).head()
    assert(r.getAs[Long]("splits") == 2L &&
      r.getAs[Long]("split_docs") == 1L &&
      r.getAs[Long]("n_bins") == 3L && r.getAs[Long]("tail_waste") == 5L)
  }

  test("auditPacking: zero-token and null-token degenerates") {
    val plan = Packing.planPacking(
      Seq((0L, Some(0L)), (1L, Some(0L)), (2L, None)).toDF("id", "n"),
      "id", "n", seqLen = 10, nBuckets = 1)
    val r = Packing.auditPacking(plan, "n", seqLen = 10).head()
    // nothing requested: no bins, no waste, perfect fill; null token
    // counts are counted as docs but excluded from token sums
    assert(r.getAs[Long]("n_docs") == 3L &&
      r.getAs[Long]("total_tokens") == 0L &&
      r.getAs[Long]("n_bins") == 0L && r.getAs[Long]("tail_waste") == 0L &&
      r.getAs[Long]("fill_bp") == 10000L && r.getAs[Long]("splits") == 0L)
  }
}
