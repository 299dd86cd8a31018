package graft

import graft.textstats.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) = texts.map(Tuple1(_)).toDF("text")

  test("identical distributions score exactly zero per token") {
    val a = docs("aa bb aa", "cc")
    val psi = Drift.tokenDrift(a, docs("aa bb aa", "cc"), "text", topK = 10)
      .collect()
    assert(psi.nonEmpty)
    assert(psi.forall(_.getLong(3) == 0L), s"got ${psi.mkString(",")}")
  }

  test("hand-computed psi_u for a planted shift") {
    // A: a a b (T=3), B: a b b (T=3), topK=3 -> p_a('a')=3/6, p_b('a')=2/6
    val out = Drift.tokenDrift(docs("aa aa bb"), docs("aa bb bb"),
      "text", topK = 3)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val expectA = math.floor((3.0 / 6 - 2.0 / 6) *
      math.log((3.0 / 6) / (2.0 / 6)) * 1e6).toLong
    assert(out("aa") == expectA && out("bb") == expectA, s"got $out")
  }

  test("psi is non-negative and absent tokens stay finite via smoothing") {
    val psi = Drift.tokenDrift(docs("xx yy zz"), docs("qq rr"), "text",
      topK = 10).collect()
    assert(psi.length == 5)
    assert(psi.forall(_.getLong(3) >= 0L))
    // a token absent on one side must not blow up (add-one smoothing)
    assert(psi.forall(r => r.getLong(1) == 0L || r.getLong(2) == 0L))
  }

  test("top-K cut keeps the K most common tokens, ties by token asc") {
    val out = Drift.tokenDrift(docs("aa aa bb bb cc"), docs("aa bb"),
      "text", topK = 2)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(out == Seq("aa", "bb"), s"got $out")
  }

  test("drift frame is stable under repartitioning") {
    val a = docs((1 to 50).map(i => s"w$i w${i % 7}").mkString(" "))
    val b = docs((1 to 50).map(i => s"w$i w${i % 5}").mkString(" "))
    val x = Drift.tokenDrift(a, b, "text", topK = 20).collect()
      .map(r => (r.getString(0), r.getLong(3))).toSet
    val y = Drift.tokenDrift(a.repartition(7), b.repartition(5), "text",
      topK = 20).collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(x == y)
  }
}
