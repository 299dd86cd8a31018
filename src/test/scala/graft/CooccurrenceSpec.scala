package graft

import graft.operators.Cooccurrence

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Int)], cap: Int = 64,
                  minPair: Long = 1L) =
    Cooccurrence.itemPairs(rows.toDF("b", "i"), "b", "i",
      maxBasketItems = cap, minPairCount = minPair)
      .collect()
      .map { r =>
        (r.getAs[Int]("item_a"), r.getAs[Int]("item_b")) ->
          ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            r.getAs[Long]("n_ab"), r.getAs[Long]("support_bp"),
            r.getAs[Long]("conf_ab_bp"), r.getAs[Long]("conf_ba_bp"),
            r.getAs[Long]("jaccard_bp"), r.getAs[Long]("lift_m")))
      }.toMap

  test("hand baskets: counts, support, both confidences, jaccard, lift") {
    // baskets: b1{1,2,3} b2{1,2} b3{1} b4{2,4} → N=4
    // n_1=3 n_2=3 n_3=1 n_4=1; n_12=2 n_13=1 n_23=1 n_24=1
    val got = run(Seq(("b1", 1), ("b1", 2), ("b1", 3),
      ("b2", 1), ("b2", 2), ("b3", 1), ("b4", 2), ("b4", 4)))
    // (1,2): support 5000, conf both 6666, jaccard 2/(3+3-2)=5000,
    // lift 1000·4·2/9 = 888
    assert(got((1, 2)) == ((3L, 3L, 2L, 5000L, 6666L, 6666L, 5000L, 888L)),
      got.toString)
    // (2,4): conf a→b 3333, b→a 10000, lift 1000·4·1/3 = 1333
    assert(got((2, 4)) == ((3L, 1L, 1L, 2500L, 3333L, 10000L, 3333L, 1333L)))
    assert(got.keySet == Set((1, 2), (1, 3), (2, 3), (2, 4)))
  }

  test("duplicate items in one basket count once (type incidence)") {
    val got = run(Seq(("b1", 1), ("b1", 1), ("b1", 2), ("b2", 1)))
    assert(got((1, 2)) == ((2L, 1L, 1L, 5000L, 5000L, 10000L, 5000L,
      1000L)), got.toString)
  }

  test("oversized baskets are excluded entirely (the basket cap), and " +
    "their items' counts shrink accordingly") {
    val big = (1 to 5).map(i => ("big", i))
    val got = run(Seq(("b1", 1), ("b1", 2)) ++ big, cap = 4)
    // the 5-item basket is dropped: N=1, only pair (1,2) remains
    assert(got.keySet == Set((1, 2)), got.toString)
    assert(got((1, 2))._1 == 1L && got((1, 2))._2 == 1L)
  }

  test("minPairCount prunes singleton pairs") {
    val got = run(Seq(("b1", 1), ("b1", 2), ("b2", 1), ("b2", 2),
      ("b3", 1), ("b3", 3)), minPair = 2L)
    assert(got.keySet == Set((1, 2)), got.toString)
  }
}
