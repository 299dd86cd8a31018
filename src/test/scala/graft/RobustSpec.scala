package graft

import org.apache.spark.sql.functions._

import graft.operators.Robust

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("groupQuantile: exact lower-nearest-rank values") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L),
      ("b", 7L)).toDF("g", "v")
    def q(bp: Int) = Robust.groupQuantile(df, "g", "v", bp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n=5: median rank ceil(0.5*5)=3 -> value 3; p20 -> rank 1 -> 1;
    // p99 -> rank ceil(4.95)=5 -> 100
    assert(q(5000) == Map("a" -> 3L, "b" -> 7L))
    assert(q(2000) == Map("a" -> 1L, "b" -> 7L))
    assert(q(9900) == Map("a" -> 100L, "b" -> 7L))
  }

  test("median/MAD resist the outlier that drags mean/stddev") {
    // 9 values near 10 plus one at 10000: median 10, MAD 1
    val vals = Seq(9L, 9L, 10L, 10L, 10L, 11L, 11L, 12L, 8L, 10000L)
    val df = vals.map(("s", _)).toDF("g", "v")
    val out = Robust.medianMad(df, "g", "v").collect().head
    assert(out.getLong(1) == 10L && out.getLong(2) == 1L && out.getLong(3) == 10L)
  }

  test("outlierScreen counts exactly the beyond-k-MAD rows") {
    val vals = Seq(9L, 9L, 10L, 10L, 10L, 11L, 11L, 12L, 8L, 10000L)
    val df = vals.map(("s", _)).toDF("g", "v")
    val out = Robust.outlierScreen(df, "g", "v", k = 3).collect().head
    // |v-10| > 3*1: only 10000 (and not 12 or 8, at deviation 2)
    assert(out.getLong(4) == 1L, out.toString)
  }

  test("MAD = 0 degenerate: any deviation at all is an outlier") {
    val df = (Seq.fill(9)(5L) :+ 6L).map(("s", _)).toDF("g", "v")
    val out = Robust.outlierScreen(df, "g", "v", k = 3).collect().head
    assert(out.getLong(2) == 0L && out.getLong(4) == 1L)
  }

  test("rateSpikes flags exactly the beyond-k-MAD buckets, with stats " +
    "and passthrough columns riding along") {
    import org.apache.spark.sql.functions.col
    // a: counts 8,10,10,12,100 → median 10, devs {0,0,2,2,90} → MAD 2
    //    spike iff |c-10| > 6 → only the 100
    // b: flat 5s → MAD 0, nothing deviates, nothing flags
    val counts = Seq(
      ("a", 1L, 8L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 12L),
      ("a", 5L, 100L),
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L))
      .toDF("g", "hour", "c")
    val got = Robust.rateSpikes(counts, "g", "c", k = 3)
      .select(col("g"), col("hour"), col("c"), col("median"), col("mad"),
        col("spike"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(got(("a", 5L)) == ((100L, 10L, 2L, 1L)))
    assert(got(("a", 1L)) == ((8L, 10L, 2L, 0L)))
    assert(got(("a", 4L)) == ((12L, 10L, 2L, 0L)))
    assert(got.filter(_._1._1 == "b").values.forall(_._4 == 0L))
    assert(got.size == 8)
  }

  test("winsorize clips into the exact per-group quantile band, flags " +
    "only moved rows, keeps every row") {
    import org.apache.spark.sql.functions.col
    // group g: values 1..20 → p10 (lower nearest rank) = 2, p90 = 18
    val df = (1L to 20L).map(v => ("g", v)).toDF("grp", "v")
    val got = Robust.winsorize(df, "grp", "v", loBp = 1000, hiBp = 9000)
      .select(col("v"), col("q_lo"), col("q_hi"), col("clipped"),
        col("was_clipped"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 20)
    assert(got.forall { case (_, lo, hi, _, _) => lo == 2L && hi == 18L })
    assert(got.forall { case (v, _, _, c, f) =>
      c == math.min(math.max(v, 2L), 18L) &&
        f == (if (v < 2L || v > 18L) 1L else 0L) })
  }

  test("partitioning-invariant on real documents") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"))
    def run(p: Int) = Robust.outlierScreen(docs.repartition(p),
      "source", "n_chars").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(run(1) == run(16))
  }

  test("plan: cumulative windows run on the distinct-value frame, not rows") {
    val df = (1 to 1000).map(i => ("s", (i % 7).toLong)).toDF("g", "v")
    val p = Robust.groupQuantile(df, "g", "v", 5000)
      .queryExecution.executedPlan.toString
    // the window's input is the (group, value) aggregate, so an
    // aggregation must appear below the window operator
    val wi = p.indexOf("Window")
    assert(wi > 0 && p.indexOf("HashAggregate", wi) > 0,
      s"window not over the count frame:\n$p")
  }

  test("scaleMinMax: exact bp endpoints, interior truncation, constant " +
    "group NULL") {
    import graft.operators.Robust
    val df = Seq(("a", 1L, 10L), ("a", 2L, 40L), ("a", 3L, 20L),
      ("c", 4L, 7L), ("c", 5L, 7L)).toDF("g", "id", "v")
    val got = Robust.scaleMinMax(df, "g", "v")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.get(r.fieldIndex("scaled_bp")))
          .map(_.asInstanceOf[Long]))
      .toMap
    // (20-10)*10000 div 30 = 3333
    assert(got == Map(1L -> Some(0L), 2L -> Some(10000L),
      3L -> Some(3333L), 4L -> None, 5L -> None), got.toString)
  }

  test("groupQuantiles one-pass grid equals per-point groupQuantile") {
    import graft.operators.Robust
    val df = (1 to 10).map(v => ("a", v.toLong)) ++
      (1 to 5).map(v => ("b", (v * 7).toLong))
    val frame = df.toDF("g", "v")
    val grid = (1 to 9).map(_ * 1000)
    val multi = Robust.groupQuantiles(frame, "g", "v", grid)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    grid.foreach { q =>
      val single = Robust.groupQuantile(frame, "g", "v", q)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      single.foreach { case (g, v) =>
        assert(multi((g, q.toLong)) == v, s"$g at $q")
      }
    }
    assert(multi.size == 18)
  }

  test("cumeDistBp: exact tie handling, NULL rows kept with NULL pct") {
    import graft.operators.Robust
    val df = Seq(("a", Some(10L)), ("a", Some(20L)), ("a", Some(20L)),
      ("a", Some(30L)), ("a", None)).toDF("g", "v")
    val got = Robust.cumeDistBp(df, "g", "v")
      .collect()
      .map(r => (Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long])))
      .toSet
    assert(got == Set((Some(10L), Some(2500L)), (Some(20L), Some(7500L)),
      (Some(30L), Some(10000L)), (None, None)), got.toString)
  }

  test("ksDistance: hand max CDF gaps vs the pooled corpus; identical " +
    "distributions read 0") {
    import graft.operators.Robust
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val got = Robust.ksDistance(df, "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    // pooled {1:2, 2:2, 3:1}, n=5; a: max at v=1 → 2666; b: v=1 → 4000
    assert(got == Map("a" -> ((3L, 2666L)), "b" -> ((2L, 4000L))),
      got.toString)
    // a group that IS the corpus distribution reads 0
    val same = Seq(("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L))
      .toDF("g", "v")
    val z = Robust.ksDistance(same, "g", "v")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(z == Map("x" -> 0L, "y" -> 0L), z.toString)
  }

  test("ksDistanceFromCounts over summed split partials == ksDistance " +
    "over rows (the monitor additivity)") {
    import graft.operators.Robust
    import org.apache.spark.sql.functions._
    val rows = (1 to 60).map(i => (s"s${i % 3}", (i * 7 % 11).toLong))
    val df = rows.toDF("g", "v")
    val direct = Robust.ksDistance(df, "g", "v")
      .collect().map(_.toSeq).toSet
    val h1 = df.filter(hash(col("v")) % 2 === 0)
    val h2 = df.filter(hash(col("v")) % 2 =!= 0)
    def cnt(d: org.apache.spark.sql.DataFrame) =
      d.groupBy(col("g").as("grp"), col("v").as("__v"))
        .agg(count(lit(1)).as("__cg"))
    val partials = cnt(h1).unionAll(cnt(h2))
      .groupBy("grp", "__v").agg(sum("__cg").as("__cg"))
    val merged = Robust.ksDistanceFromCounts(partials)
      .collect().map(_.toSeq).toSet
    assert(merged == direct)
  }

  test("ksDistance grid guard: a continuous column past the distinct-value " +
    "ceiling fails fast; the banded path passes and equals direct KS on " +
    "the banded column") {
    import graft.operators.Robust
    import org.apache.spark.sql.functions._
    // 500 distinct "continuous" values against a ceiling of 100 → refuse
    val wide = (1 to 500).map(i => (s"s${i % 2}", i.toLong)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      Robust.ksDistance(wide, "g", "v", maxGridValues = 100L)
    }
    assert(e.getMessage.contains("maxGridValues") &&
      e.getMessage.toLowerCase.contains("band"), e.getMessage)
    // banding collapses the grid under the same ceiling: 10 buckets of 50
    val banded = wide.withColumn("v", col("v") - pmod(col("v"), lit(50L)))
    val guarded = Robust.ksDistance(banded, "g", "v", maxGridValues = 100L)
      .collect().map(_.toSeq).toSet
    // and the guarded result IS the plain KS of the banded distribution
    val unguarded = Robust.ksDistance(banded, "g", "v")
      .collect().map(_.toSeq).toSet
    assert(guarded == unguarded && guarded.nonEmpty)
  }

  test("winsorize: a NULL measurement comes back NULL, never fabricated " +
    "as the group's high band; stats-less groups pass through") {
    import graft.operators.Robust
    val df = Seq(("g", Some(1L)), ("g", Some(100L)), ("g", Some(200L)),
      ("g", Some(300L)), ("g", None)).toDF("grp", "v")
    val rows = Robust.winsorize(df, "grp", "v", 2500, 7500).collect()
    def opt(r: org.apache.spark.sql.Row, c: String) = {
      val i = r.fieldIndex(c)
      if (r.isNullAt(i)) None else Some(r.getLong(i))
    }
    val out = rows.map(r =>
      (opt(r, "v"), opt(r, "clipped"), opt(r, "was_clipped")))
    // every row returns; the NULL v row carries NULL clipped + NULL flag
    assert(out.length == 5)
    val nullRow = out.filter(_._1 == None)
    assert(nullRow.length == 1 &&
      nullRow.head._2 == None && nullRow.head._3 == None, out.mkString(","))
  }

  test("rateSpikes keeps every input bucket even for a group with no " +
    "baseline (all-NULL values), spike 0 not a silent drop") {
    import graft.operators.Robust
    val counts = Seq(("a", Some(10L)), ("a", Some(12L)), ("a", Some(90L)),
      ("dead", Option.empty[Long]), ("dead", Option.empty[Long]))
      .toDF("grp", "c")
    val out = Robust.rateSpikes(counts, "grp", "c", k = 3).collect()
    assert(out.length == 5, s"rows dropped: ${out.length}")
    assert(out.count(_.getString(0) == "dead") == 2)
    assert(out.filter(_.getString(0) == "dead")
      .forall(r => r.getLong(r.fieldIndex("spike")) == 0L))
  }
}
