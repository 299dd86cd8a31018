package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: exact nulls, distincts, min/max per column") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("a")), (5L, None))
      .toDF("id", "tag")
    val out = Profile.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getString(4), r.getString(5))).toMap
    assert(out("id") == ((5L, 0L, 5L, "1", "5")))
    assert(out("tag") == ((5L, 2L, 2L, "a", "b")))
  }

  test("profile runs as ONE job: a single aggregation, no per-column scans") {
    val df = (1 to 100).map(i => (i.toLong, s"s${i % 7}")).toDF("id", "tag")
    val plan = Profile.profile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    // exactly one scan of the input relation
    val scans = "LocalTableScan".r.findAllIn(plan).size +
      "FileScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
    // multi-distinct plans through Expand, still one aggregation pipeline
    assert(plan.contains("Expand"), s"no Expand for multi-distinct:\n$plan")
  }

  test("empty frame: zero rows, zero distincts, null min/max") {
    val df = Seq.empty[(Long, String)].toDF("id", "tag")
    val out = Profile.profile(df, Seq("tag")).collect().head
    assert(out.getLong(1) == 0L && out.getLong(3) == 0L && out.isNullAt(4))
  }

  test("datasetFingerprint is order/partitioning-invariant, content-sensitive") {
    val rows = (1 to 40).map(i => (i.toLong, s"text $i", s"s${i % 3}"))
    val a = rows.toDF("id", "text", "source")
    val b = scala.util.Random.shuffle(rows).toDF("id", "text", "source")
      .repartition(7)
    def fp(df: org.apache.spark.sql.DataFrame) =
      Profile.datasetFingerprint(df, "source", Seq("id", "text"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(fp(a) == fp(b), "same logical slice must checksum identically")
    // one edited row flips its source's fingerprint in both channels
    val edited = rows.map { case (i, t, s) =>
      (i, if (i == 17L) t + "!" else t, s) }.toDF("id", "text", "source")
    val (fa, fe) = (fp(a), fp(edited))
    val src = "s" + (17 % 3)
    assert(fa(src)._2 != fe(src)._2 && fa(src)._3 != fe(src)._3)
    assert(fa.filterNot(_._1 == src) == fe.filterNot(_._1 == src),
      "untouched sources must keep their fingerprints")
  }

  test("keyCandidates: unique non-null columns are keys, FDs hold only " +
    "for total determinants") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("en"), "s0"),
      (2L, Some("en"), "s0"),
      (3L, None, "s1")).toDF("id", "lang", "src")
    val got = graft.operators.Profile.keyCandidates(df,
      Seq("id", "lang", "src"))
      .collect().map(r => (r.getAs[String]("kind"), r.getAs[String]("subject"),
        r.getAs[String]("detail")) ->
        ((r.getAs[Long]("n_distinct"), r.getAs[Long]("holds")))).toMap
    assert(got(("key", "id", "")) == ((3L, 1L)))
    // lang: 1 distinct non-null value, nullable -> not a key
    assert(got(("key", "lang", "")) == ((1L, 0L)))
    assert(got(("key", "src", "")) == ((2L, 0L)))      // dup values
    // id determines everything (total + unique)
    assert(got(("fd", "id", "lang"))._2 == 1L)
    assert(got(("fd", "id", "src"))._2 == 1L)
    // src -> lang: s0 -> en, s1 -> NULL: single b per a, determinant
    // total -> holds
    assert(got(("fd", "src", "lang"))._2 == 1L)
    // lang is nullable: the partial FD reports 0 by declared design
    assert(got(("fd", "lang", "src"))._2 == 0L)
    assert(got.size == 9)
  }

  test("profileDiff: added/removed/common status, null-rate shift, " +
    "distinct delta, null-safe min/max flag") {
    import spark.implicits._
    val v1 = Seq(
      (1L, Some("en"), "web"), (2L, Some("fr"), "web"),
      (3L, Some("en"), "book"), (4L, Some("de"), "web"))
      .toDF("id", "lang", "src")
    val v2 = Seq(
      (1L, None: Option[String], 7L), (2L, Some("fr"), 8L),
      (3L, Some("en"), 9L))
      .toDF("id", "lang", "rev")
    val got = graft.operators.Profile.profileDiff(
      v1, Seq("id", "lang", "src"), v2, Seq("id", "lang", "rev"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), Option(r.get(4)), Option(r.get(7)),
          Option(r.get(8)))).toMap
    assert(got("src")._1 == "removed" && got("rev")._1 == "added")
    // lang: nulls 0/4 -> 1/3: delta = 3333 - 0; distinct 3 -> 2
    assert(got("lang") == (("common", Some(3333L), Some(-1L), Some(1L))),
      got.toString)
    // id: max 4 -> 3, so minmax flips; no null shift
    assert(got("id") == (("common", Some(0L), Some(-1L), Some(1L))),
      got.toString)
    // added/removed rows carry NULL deltas
    assert(got("src")._2.isEmpty && got("rev")._2.isEmpty)
  }

  test("giniConcentration: even weights 0, two-group max 500, zero " +
    "total NULL, weights aggregate within groups first") {
    import spark.implicits._
    def gini(rows: Seq[(String, Long)]) =
      graft.operators.Profile.giniConcentration(
        rows.toDF("g", "w"), "g", "w")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).head
    assert(gini(Seq(("a", 5L), ("b", 5L))) == ((2L, 10L, Some(0L))))
    assert(gini(Seq(("a", 0L), ("b", 10L))) == ((2L, 10L, Some(500L))))
    assert(gini(Seq(("a", 0L), ("b", 0L))) == ((2L, 0L, None)))
    // per-group aggregation before ranking: ("a",3)+("a",2) == ("a",5)
    assert(gini(Seq(("a", 3L), ("a", 2L), ("b", 5L))) ==
      ((2L, 10L, Some(0L))))
  }

  test("diversityIndex: single-category zero, even split hand value, " +
    "nulls excluded") {
    import spark.implicits._
    def run(rows: Seq[(String, String)]) =
      graft.operators.Profile.diversityIndex(
        rows.toDF("g", "c"), "g", "c")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // a: 4 even over 2 cats → 10000 − 10000·8/16 = 5000; b: one cat → 0
    val got = run(Seq(("a", "x"), ("a", "x"), ("a", "y"), ("a", "y"),
      ("b", "x"), ("b", "x")))
    assert(got == Map("a" -> ((4L, 2L, 5000L)), "b" -> ((2L, 1L, 0L))),
      got.toString)
    // 3 cats of 1 each: 10000 − 10000·3/9 = 6667
    val t = run(Seq(("t", "x"), ("t", "y"), ("t", "z")))
    assert(t("t") == ((3L, 3L, 6667L)), t.toString)
  }

  test("shardBalance: deterministic polynomial shards, empty shards " +
    "explicit at -10000 bp, deviations exact") {
    import spark.implicits._
    val df = (1L to 40L).map(Tuple1(_)).toDF("k")
    val got = graft.operators.Profile.shardBalance(df, "k", 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 4)
    assert(got.map(_._2).sum == 40L)
    // dev math: (10000 * n * 4) div 40 - 10000 == 1000*n - 10000
    got.foreach { case (_, n, dev) => assert(dev == 1000 * n - 10000) }
    // a constant key concentrates everything in one shard
    val hot = Seq.fill(10)(Tuple1("x")).toDF("k")
    val h = graft.operators.Profile.shardBalance(hot, "k", 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    assert(h.count(_._1 == 0L) == 3)
    assert(h.contains((10L, 30000L)))
    assert(h.filter(_._1 == 0L).forall(_._2 == -10000L))
  }

  test("groupMode: higher count wins, ties break to the smaller value, " +
    "nulls excluded") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "z"), ("b", "y"), ("c", null)).toDF("g", "v")
    val got = graft.operators.Profile.groupMode(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getLong(2)))).toMap
    assert(got == Map("a" -> (("x", 2L)), "b" -> (("y", 1L))),
      got.toString)
  }
}
