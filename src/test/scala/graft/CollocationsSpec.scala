package graft

import graft.textstats.Collocations

/** PMI collocation mining: hand-computed values, the min-count gate, and
  * the chance-vs-collocation ordering. */
class CollocationsSpec extends SparkSpec {

  import spark.implicits._

  test("PMI matches the hand-computed value on a tiny corpus") {
    // 10 docs "new york", so: c12(new,york)=10, c1=c2=10, N=20
    // PMI = ln(10*20/(10*10)) = ln(2)
    val docs = Seq.fill(10)("new york").toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 5L).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("w1") == "new" && r.getAs[String]("w2") == "york")
    assert(r.getAs[Long]("c12") == 10L)
    assert(r.getAs[Long]("pmi_u") == math.floor(math.log(2.0) * 1e6).toLong,
      s"expected floor(ln 2 * 1e6): $r")
  }

  test("minCount gates out rare pairs") {
    val docs = (Seq.fill(5)("alpha beta") ++ Seq.fill(2)("gamma delta"))
      .toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("alpha", "beta")), s"got $out")
  }

  test("a true collocation out-scores a chance co-occurrence") {
    // "san francisco" always adjacent; "the" pairs with everything
    val docs = (Seq.fill(20)("san francisco") ++
      (1 to 20).map(i => s"the w$i the city the place")).toDF("text")
    val out = Collocations.pmiBigrams(docs, "text", minCount = 3L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("pmi_u"))).toMap
    val sf = out(("san", "francisco"))
    assert(out.filterKeys(_ != ("san", "francisco")).values
      .forall(_ < sf), s"collocation must out-score chance pairs: $out")
  }

  test("docs shorter than two tokens contribute no pairs") {
    val docs = Seq("solo", "", "pair of tokens").toDF("text")
    // every candidate pair occurs once; with minCount=1 only real
    // adjacencies appear, and the single-token/empty docs add none
    val out = Collocations.pmiBigrams(docs, "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("pair", "of"), ("of", "tokens")), s"got $out")
  }

  test("nextTokenTable: exact conditional probabilities, rank order, " +
    "and the minCount output prune keeping true ranks") {
    import spark.implicits._
    val docs = Seq("x y", "x y", "x z").map(Tuple1(_)).toDF("text")
    val got = graft.textstats.Collocations
      .nextTokenTable(docs, "text", k = 2, minCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getInt(4), r.getLong(5)))).toMap
    assert(got == Map(
      ("x", "y") -> ((2L, 3L, 1, 6666L)),
      ("x", "z") -> ((1L, 3L, 2, 3333L))), got.toString)
    // minCount prunes the low-evidence follower but its rank survives
    val pruned = graft.textstats.Collocations
      .nextTokenTable(docs, "text", k = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(4)))
    assert(pruned.toSeq == Seq(("x", "y", 1)), pruned.mkString(","))
  }
}
