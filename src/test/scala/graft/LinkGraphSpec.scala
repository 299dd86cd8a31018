package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkGraph

class LinkGraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    LinkGraph.pageRank(edges.toDF("src", "dst"), iters)
      .as[(String, Long)].collect().toMap

  test("hand-computed two iterations on a 3-node graph") {
    val e = Seq(("A", "B"), ("B", "A"), ("C", "A"))
    // p0 = 1e6 each; outdeg all 1
    // p1: A: 150000+(85*(1e6+1e6))//100 = 1850000
    //     B: 150000+(85*1e6)//100      = 1000000
    //     C: 150000 (no inlinks)
    assert(ranks(e, 1) ==
      Map("A" -> 1850000L, "B" -> 1000000L, "C" -> 150000L))
    // p2: A: 150000+(85*(1000000+150000))//100 = 1127500
    //     B: 150000+(85*1850000)//100          = 1722500
    assert(ranks(e, 2) ==
      Map("A" -> 1127500L, "B" -> 1722500L, "C" -> 150000L))
  }

  test("iters = 0 returns the uniform initial ranks") {
    assert(ranks(Seq(("A", "B")), 0) == Map("A" -> 1000000L, "B" -> 1000000L))
  }

  test("parallel edges collapse; an endorsement counts once") {
    val dup = ranks(Seq(("A", "B"), ("A", "B"), ("A", "C")), 2)
    val one = ranks(Seq(("A", "B"), ("A", "C")), 2)
    assert(dup == one)
  }

  test("out-degree splits contribution with integer floor") {
    // A→B, A→C: each gets pr(A) div 2 = 500000
    // B: 150000+(85*500000)//100 = 575000, same C
    val r = ranks(Seq(("A", "B"), ("A", "C")), 1)
    assert(r("B") == 575000L && r("C") == 575000L && r("A") == 150000L)
  }

  test("dangling mass evaporates by documented design; ranks stay local") {
    // B has no outlinks: its rank is received, never re-emitted
    val r = ranks(Seq(("A", "B")), 3)
    assert(r("A") == 150000L)
    // B's steady state: 150000 + (85 * 150000) // 100 after A settles
    assert(r("B") == 150000L + (85L * 150000L) / 100L)
  }

  test("self-loop feeds its own next rank, no special-casing") {
    val r = ranks(Seq(("A", "A")), 1)
    assert(r == Map("A" -> (150000L + (85L * 1000000L) / 100L)))
  }

  test("trustRank: hand-computed seeded iteration; unseeded nodes only " +
    "earn rank through inlinks from seeded regions") {
    val edges = Seq(("S", "A"), ("A", "B")).toDF("src", "dst")
    val tele = Seq(("S", 1000000L)).toDF("node", "tele")
    // pp0: S=1e6, A=0, B=0
    // pp1: S=1e6 (no inlinks, tele only)
    //      A: 0 + (85·1e6)//100 = 850000; B: 0 + 0 = 0
    val r1 = LinkGraph.trustRank(edges, tele, 1)
      .as[(String, Long)].collect().toMap
    assert(r1 == Map("S" -> 1000000L, "A" -> 850000L, "B" -> 0L))
    // pp2: A: (85·1e6)//100 = 850000; B: (85·850000)//100 = 722500
    val r2 = LinkGraph.trustRank(edges, tele, 2)
      .as[(String, Long)].collect().toMap
    assert(r2 == Map("S" -> 1000000L, "A" -> 850000L, "B" -> 722500L))
  }

  test("trustRank keeps an EDGELESS teleport seed (its restart mass must " +
    "appear, not vanish from the node set)") {
    val edges = Seq(("A", "B")).toDF("src", "dst")
    val tele = Seq(("A", 500000L), ("ISOLATED", 900000L))
      .toDF("node", "tele")
    val r = LinkGraph.trustRank(edges, tele, 2)
      .as[(String, Long)].collect().toMap
    // the isolated seed holds exactly its teleport mass every iteration
    assert(r.get("ISOLATED") == Some(900000L), s"got $r")
    assert(r.keySet == Set("A", "B", "ISOLATED"))
  }

  test("trustRank with uniform teleport 150000 reduces toward pageRank's " +
    "restart structure on seeded nodes") {
    val edges = Seq(("A", "B"), ("B", "A")).toDF("src", "dst")
    val tele = Seq(("A", 150000L), ("B", 150000L)).toDF("node", "tele")
    // pr0 = 150000 each; pr1 = 150000 + (85·150000)//100 = 277500 each
    val r = LinkGraph.trustRank(edges, tele, 1)
      .as[(String, Long)].collect().toMap
    assert(r == Map("A" -> 277500L, "B" -> 277500L))
  }

  test("reciprocalProfile: exchange share per host, self-loops excluded") {
    val e = Seq(("A", "B"), ("B", "A"), ("A", "C"), ("C", "C"))
    val got = LinkGraph.reciprocalProfile(e.toDF("src", "dst"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // A: 2 outlinks, 1 reciprocated → 5000 bp; B: 1 of 1 → 10000 bp
    assert(got == Map("A" -> ((2L, 1L, 5000L)), "B" -> ((1L, 1L, 10000L))))
    // C's only edge is a self-loop → no measurable exchange, absent
  }

  test("reciprocalProfile: parallel edges collapse before counting") {
    val e = Seq(("A", "B"), ("A", "B"), ("B", "A"))
    val got = LinkGraph.reciprocalProfile(e.toDF("src", "dst"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("A") == ((1L, 1L, 10000L)))
  }

  test("plan: equi-joins only, never all-pairs") {
    val df = LinkGraph.pageRank(
      Seq(("A", "B"), ("B", "C"), ("C", "A")).toDF("src", "dst"), 3)
    assertNoCartesian(df)
  }

  test("25 iterations: plan depth stays bounded by the checkpoint " +
    "cadence, and the 2-cycle fixpoint holds exactly") {
    // a 2-cycle is at its integer fixpoint from iteration 0:
    // pr' = 150000 + (85·10⁶ div 1) div 100 = 10⁶ — so any iteration
    // count must return exactly 10⁶ per node; with lineage cut every 8
    // iterations the final plan carries at most one cadence window of
    // joins, not 25 (2 joins per iteration, plus edge/node scaffolding)
    val pr = LinkGraph.pageRank(
      Seq(("A", "B"), ("B", "A")).toDF("src", "dst"), iters = 25)
    val nJoins = "Join".r
      .findAllIn(pr.queryExecution.optimizedPlan.toString).size
    assert(nJoins <= 24, s"plan grew past the checkpoint window: $nJoins joins")
    assert(pr.as[(String, Long)].collect().toMap ==
      Map("A" -> 1000000L, "B" -> 1000000L))
    // trustRank under the same depth: bounded plan, seeded fixpoint
    val tr = LinkGraph.trustRank(
      Seq(("A", "B"), ("B", "A")).toDF("src", "dst"),
      Seq(("A", 150000L), ("B", 150000L)).toDF("node", "tele"), iters = 25)
    val tJoins = "Join".r
      .findAllIn(tr.queryExecution.optimizedPlan.toString).size
    assert(tJoins <= 24, s"trustRank plan grew: $tJoins joins")
    // symmetric 2-cycle, outdeg 1: the per-node recurrence is scalar —
    // replay it exactly (integer floor division on positives)
    var p = 150000L
    for (_ <- 1 to 25) p = 150000L + (85L * p) / 100L
    assert(tr.as[(String, Long)].collect().toMap == Map("A" -> p, "B" -> p))
  }

  test("partitioning invariance: same ranks under a different layout") {
    val e = (0L until 200L).map(i => (s"h${i % 11}", s"h${(i * 3 + 1) % 11}"))
    val a = ranks(e, 3)
    val b = LinkGraph.pageRank(e.toDF("src", "dst").repartition(7), 3)
      .as[(String, Long)].collect().toMap
    assert(a == b)
  }

  test("hits: exact alternating-walk counts on a hand graph, zero-score " +
    "nodes present, iters cap enforced") {
    import spark.implicits._
    val edges = Seq(("a", "c"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    def run(iters: Int) = graft.operators.LinkGraph.hits(edges, iters)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // iter 1: a = indeg (c=2, d=1); h = sum of a over outlinks
    assert(run(1) == Map("a" -> ((0L, 2L)), "b" -> ((0L, 2L)),
      "c" -> ((2L, 1L)), "d" -> ((1L, 0L))))
    // iter 2: c = h(a)+h(b) = 4, d = h(c) = 1; hubs a=b=4, c=1
    assert(run(2) == Map("a" -> ((0L, 4L)), "b" -> ((0L, 4L)),
      "c" -> ((4L, 1L)), "d" -> ((1L, 0L))))
    intercept[IllegalArgumentException] {
      graft.operators.LinkGraph.hits(edges, 4)
    }
  }
}
