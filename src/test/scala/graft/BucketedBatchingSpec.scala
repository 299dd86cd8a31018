package graft

import graft.operators.BucketedBatching

class BucketedBatchingSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], seqLen: Int = 16) =
    BucketedBatching.plan(rows.toDF("id", "n"), "id", "n", seqLen)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("pow2 classes, capacity fills, id-order ranks, no splits") {
    // seqLen 16: class 4 holds 4 docs/bin, class 8 holds 2
    val got = run(Seq(
      (1L, 3L), (2L, 4L), (3L, 3L), (4L, 4L), (5L, 3L), // class 4 x5
      (10L, 5L), (11L, 8L), (12L, 7L)))                 // class 8 x3
    assert(got(1L) == ((3L, 4L, 0L, 0L)), got.toString)
    assert(got(4L) == ((4L, 4L, 0L, 3L)))   // fourth of bin 0
    assert(got(5L) == ((3L, 4L, 1L, 0L)))   // overflows into bin 1
    assert(got(10L) == ((5L, 8L, 0L, 0L)))
    assert(got(11L) == ((8L, 8L, 0L, 1L)))
    assert(got(12L) == ((7L, 8L, 1L, 0L)))
  }

  test("class identity: exact powers stay, n=1 is class 1, " +
    "boundary n=seqLen fills a single-slot bin") {
    val got = run(Seq((1L, 1L), (2L, 2L), (3L, 16L)))
    assert(got(1L)._2 == 1L)
    assert(got(2L)._2 == 2L)
    assert(got(3L) == ((16L, 16L, 0L, 0L)))
  }

  test("non-power-of-two seqLen is rejected loudly (the zero-capacity " +
    "top class)") {
    val df = Seq((1L, 3L)).toDF("id", "n")
    val e = intercept[IllegalArgumentException] {
      BucketedBatching.plan(df, "id", "n", seqLen = 100)
    }
    assert(e.getMessage.contains("power of two"))
  }

  test("docs longer than seqLen and empty docs are excluded by contract") {
    val got = run(Seq((1L, 17L), (2L, 0L), (3L, 4L)))
    assert(got.keySet == Set(3L), got.toString)
  }

  test("plan equals the naive per-class rank formulation and is " +
    "partitioning-invariant") {
    val rows = (1 to 300).map(i => (i.toLong, (i % 16 + 1).toLong))
    val df = rows.toDF("id", "n")
    def naive = {
      val byClass = rows.filter(r => r._2 >= 1 && r._2 <= 16)
        .map { case (id, n) =>
          val cls = if (n <= 1) 1L
            else java.lang.Long.highestOneBit(2 * n - 1)
          (id, n, cls)
        }.groupBy(_._3).flatMap { case (cls, docs) =>
          val cap = 16 / cls
          docs.sortBy(_._1).zipWithIndex.map { case ((id, n, c), r) =>
            id -> ((n, c, r / cap, r % cap))
          }
        }.toMap
      naiveResult(byClass)
    }
    def naiveResult(m: Map[Long, (Long, Long, Long, Long)]) = m
    val got = BucketedBatching.plan(df.repartition(7), "id", "n", 16)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == naive)
  }
}
