package graft

import graft.dedup.LshPlan

/** LSH banding planner: the integer fixed-point S-curve must match a
  * local replay of the same fold exactly, and the best flag must mark
  * the (cost, r)-minimal split. */
class LshPlanSpec extends SparkSpec {

  private def replay(numHashes: Int, thresholdBp: Int)
      : Map[(Int, Int), (Long, Long, Long)] = {
    def powFix(base: Long, e: Int): Long =
      (2 to e).foldLeft(base)((a, _) => a * base / 10000L)
    val grid = (0 until 100).map(_ * 100L + 50L)
    (1 to numHashes).filter(numHashes % _ == 0).map { r =>
      val b = numHashes / r
      val ps = grid.map { s =>
        (s, 10000L - powFix(10000L - powFix(s, r), b))
      }
      val fp = ps.collect { case (s, p) if s < thresholdBp => p }.sum
      val fn = ps.collect { case (s, p) if s > thresholdBp => 10000L - p }.sum
      (b, r) -> ((fp, fn, fp + fn))
    }.toMap
  }

  test("every divisor split's fp/fn masses equal the local fixed-point " +
    "replay; best marks the (cost, r)-minimal row") {
    val rows = LshPlan.bandPlan(spark, 16, 8000).collect()
      .map(r => (r.getAs[Int]("b"), r.getAs[Int]("r")) ->
        ((r.getAs[Long]("fp_u"), r.getAs[Long]("fn_u"),
          r.getAs[Long]("cost_u"), r.getAs[Long]("best")))).toMap
    val exp = replay(16, 8000)
    assert(rows.keySet == exp.keySet, s"splits: ${rows.keySet}")
    exp.foreach { case (k, (fp, fn, c)) =>
      assert(rows(k)._1 == fp && rows(k)._2 == fn && rows(k)._3 == c,
        s"$k: got ${rows(k)}, want ($fp, $fn, $c)")
    }
    val bestKey = exp.minBy { case ((_, r), (_, _, c)) => (c, r) }._1
    assert(rows(bestKey)._4 == 1L, s"best must be $bestKey: $rows")
    assert(rows.count(_._2._4 == 1L) == 1, "exactly one best row")
  }

  test("degenerate splits r = 1 (pure OR) and b = 1 (pure AND) behave " +
    "as the S-curve extremes") {
    val rows = LshPlan.bandPlan(spark, 8, 5000).collect()
      .map(r => r.getAs[Int]("r") ->
        ((r.getAs[Long]("fp_u"), r.getAs[Long]("fn_u")))).toMap
    // r = 1, b = 8: aggressive OR — huge false-positive mass, tiny fn
    // r = 8, b = 1: aggressive AND — tiny fp, huge fn
    assert(rows(1)._1 > rows(8)._1, s"OR must out-fp AND: $rows")
    assert(rows(8)._2 > rows(1)._2, s"AND must out-fn OR: $rows")
  }

  test("invalid arguments are rejected") {
    intercept[IllegalArgumentException] {
      LshPlan.bandPlan(spark, 0, 8000)
    }
    intercept[IllegalArgumentException] {
      LshPlan.bandPlan(spark, 16, 0)
    }
    intercept[IllegalArgumentException] {
      LshPlan.bandPlan(spark, 16, 8000, gridStep = 3)
    }
  }
}
