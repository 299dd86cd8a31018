package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")
    .withColumn("stratum", (col("id") % 2 === 0).cast("string"))

  test("lcgBp and hashBp are deterministic and in [0, 10000)") {
    for (bp <- Seq(Sampling.lcgBp(col("id")), Sampling.hashBp(col("id")))) {
      val a = ids(500).select(bp.as("bp")).as[Long].collect().toSeq
      val b = ids(500).repartition(7).select(bp.as("bp")).as[Long]
        .collect().toSeq.sorted
      assert(a.sorted == b) // stable under repartitioning
      assert(a.forall(v => v >= 0 && v < 10000))
    }
  }

  test("lcgBp reaches every residue class (multiplier coprime to 10000)") {
    val vals = ids(20000).select(Sampling.lcgBp(col("id")).as("bp"))
      .as[Long].collect()
    // non-multiples of 5 must be reachable (the classic 1103515245
    // constant shares a factor 5 with 10^4 and only ever lands on
    // multiples of 5, quantizing every sample rate to 5 bp)
    assert(vals.exists(_ % 5 != 0))
    assert(vals.distinct.length > 9000, "bp distribution collapsed")
  }

  test("stratified rates land near their targets") {
    val s = Sampling.stratifiedSample(ids(10000), "stratum",
      Map("true" -> 2000), defaultBp = 7000, bp = Sampling.hashBp(col("id")))
    val byStratum = s.groupBy("stratum").count().as[(String, Long)]
      .collect().toMap
    // 5000 rows per stratum; hash rates concentrate tightly
    assert(math.abs(byStratum("true") - 1000L) < 150)
    assert(math.abs(byStratum("false") - 3500L) < 200)
  }

  test("sample is a subset and re-running yields the identical sample") {
    val df = ids(1000)
    val bp = Sampling.hashBp(col("id"), salt = 7L)
    val s1 = Sampling.stratifiedSample(df, "stratum", Map.empty, 5000, bp)
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedSample(df, "stratum", Map.empty, 5000, bp)
      .select("id").as[Long].collect().toSet
    assert(s1 == s2 && s1.size < 1000)
  }

  test("sampling plans with zero exchanges (filter at the scan)") {
    val plan = Sampling.stratifiedSample(ids(100), "stratum",
        Map("true" -> 1000), 5000, Sampling.hashBp(col("id")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("mixDatasets tags lineage and respects per-source rates") {
    val a = ids(4000).select(col("id"))
    val b = ids(4000).select((col("id") + 100000L).as("id"))
    val mixed = Sampling.mixDatasets(
      Seq(("web", a, 2500), ("books", b, 7500)),
      df => Sampling.hashBp(df("id")))
    val counts = mixed.groupBy("mix_source").count().as[(String, Long)]
      .collect().toMap
    assert(math.abs(counts("web") - 1000L) < 150)
    assert(math.abs(counts("books") - 3000L) < 200)
    assert(mixed.columns.contains("mix_source"))
  }

  /** Naive reference: row_number over (score DESC, tie ASC), keep ⌈N·f⌉. */
  private def naiveTopFrac(df: org.apache.spark.sql.DataFrame, g: String,
                           s: String, t: String, num: Int, den: Int) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(g).orderBy(desc(s), asc(t))
    val n = Window.partitionBy(g)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__rn") * den <= col("__n") * num + (den - 1))
      .drop("__rn", "__n")
  }

  test("topFracByScore equals the naive ranked formulation, ties included") {
    // heavy ties at the boundary: scores 0..9 each repeated 10× per group
    val df = (0L until 200L).toDF("id")
      .withColumn("g", (col("id") % 2).cast("string"))
      .withColumn("score", (col("id") / 2 % 10).cast("long"))
    for ((num, den) <- Seq((1, 10), (1, 4), (3, 10), (1, 1))) {
      val fast = Sampling.topFracByScore(df, "g", "score", "id", num, den)
        .select("id").as[Long].collect().toSet
      val slow = naiveTopFrac(df, "g", "score", "id", num, den)
        .select("id").as[Long].collect().toSet
      assert(fast == slow, s"mismatch at $num/$den")
      assert(fast.size == 2 * ((100 * num + den - 1) / den))
    }
  }

  test("topFracByScore: a group smaller than 1/frac still keeps one row") {
    val df = Seq(("a", 5L, 1L), ("a", 7L, 2L), ("b", 1L, 3L))
      .toDF("g", "score", "id")
    val out = Sampling.topFracByScore(df, "g", "score", "id", 1, 10)
      .as[(String, Long, Long)].collect().toSet
    // k = ceil(2/10) = 1 for a (the max score wins), ceil(1/10) = 1 for b
    assert(out == Set(("a", 7L, 2L), ("b", 1L, 3L)))
  }

  test("tokenBudgetSample equals the naive global running-sum formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 2000L).toDF("id")
      .withColumn("n_tok", (col("id") % 37 + 1).cast("long"))
    val bp = Sampling.lcgBp(col("id"))
    for (budget <- Seq(1L, 500L, 7777L, 1000000L)) {
      val fast = Sampling.tokenBudgetSample(df, "id", "n_tok", budget, bp)
        .select("id").as[Long].collect().toSet
      val w = Window.orderBy(Sampling.lcgBp(col("id")), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val slow = df
        .withColumn("__before", sum(col("n_tok")).over(w) - col("n_tok"))
        .filter(col("__before") < budget)
        .select("id").as[Long].collect().toSet
      assert(fast == slow, s"mismatch at budget=$budget")
      // the budget is filled: kept tokens reach it (boundary may overflow)
      val kept = df.filter(col("id").isin(fast.toSeq: _*))
        .agg(sum("n_tok")).as[Long].head()
      if (budget <= 38000L) assert(kept >= budget)
      else assert(fast.size == 2000)
    }
  }

  test("tokenBudgetSample: zero-token doc exactly AT the budget is excluded") {
    // one bp key (bp = const) ending in an n_tok=0 doc, budget == key total:
    // that doc's strictly-before sum equals the budget and must drop —
    // the cumk == budget key may not be blanket-admitted
    val df = Seq((1L, 5L), (2L, 3L), (3L, 0L)).toDF("id", "n_tok")
    val kept = Sampling.tokenBudgetSample(df, "id", "n_tok", 8L, lit(0L))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"got $kept")
  }

  test("scoreNtile equals the engine ntile window, heavy ties included") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 1000L).toDF("id")
      .withColumn("score", (col("id") % 13).cast("long")) // ~77-way ties
    for (n <- Seq(1, 3, 10, 999, 1500)) { // 1500 > N: more buckets than rows
      val fast = Sampling.scoreNtile(df, "score", "id", n)
        .select("id", "bucket").as[(Long, Int)].collect().toMap
      val w = Window.orderBy(desc("score"), asc("id"))
      val slow = df.withColumn("bucket", ntile(n).over(w))
        .select("id", "bucket").as[(Long, Int)].collect().toMap
      assert(fast == slow, s"ntile mismatch at n=$n")
    }
  }

  test("scoreNtile keeps NULL scores and ranks them last, like engine ntile") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)), (4L, None),
      (5L, Some(5L))).toDF("id", "score")
    val fast = Sampling.scoreNtile(df, "score", "id", 2)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    val w = Window.orderBy(desc("score"), asc("id"))
    val slow = df.withColumn("bucket", ntile(2).over(w))
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(fast.size == 5, s"NULL-score rows dropped: $fast")
    assert(fast == slow)
  }

  test("scoreNtile broadcasts histogram marks; rank window is per-score") {
    val df = (0L until 500L).toDF("id")
      .withColumn("score", (col("id") % 7).cast("long"))
    val out = Sampling.scoreNtile(df, "score", "id", 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"marks not broadcast:\n$plan")
    out.count()
  }

  test("tokenBudgetSample is stable under repartitioning") {
    val df = (0L until 500L).toDF("id")
      .withColumn("n_tok", (col("id") % 11 + 1).cast("long"))
    val a = Sampling.tokenBudgetSample(df, "id", "n_tok", 300L,
      Sampling.lcgBp(col("id"))).select("id").as[Long].collect().toSet
    val b = Sampling.tokenBudgetSample(df.repartition(13), "id", "n_tok",
      300L, Sampling.lcgBp(col("id"))).select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("topFracByScore broadcasts thresholds — no corpus-wide rank window") {
    val df = (0L until 1000L).toDF("id")
      .withColumn("g", (col("id") % 3).cast("string"))
      .withColumn("score", (col("id") % 17).cast("long"))
    val out = Sampling.topFracByScore(df, "g", "score", "id", 1, 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"thresholds not broadcast:\n$plan")
    out.count()
  }

  test("sampleKPerGroup equals the naive ranked formulation, ranks included") {
    val df = ids(3000).withColumn("g", (col("id") % 7).cast("string"))
    val got = Sampling.sampleKPerGroup(df, "g", "id", k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    import org.apache.spark.sql.expressions.Window
    val pri = (col("id") % 1000003L) * 1103515249L + 12345L
    val w = Window.partitionBy("g").orderBy(pri.asc, col("id").asc)
    val naive = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 25)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("id"),
        r.getAs[Int]("rank"))).toSet
    assert(got == naive)
  }

  test("sampleKPerGroup: exact k per group, stable under repartitioning") {
    val df = ids(2000).withColumn("g", (col("id") % 5).cast("string"))
    val a = Sampling.sampleKPerGroup(df, "g", "id", k = 40)
    val sizes = a.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(sizes.values.toSet == Set(40L))
    val b = Sampling.sampleKPerGroup(df.repartition(13), "g", "id", k = 40)
    assert(a.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      b.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
    // a group smaller than k keeps all its rows
    val tiny = Sampling.sampleKPerGroup(ids(3).withColumn("g", lit("x")),
      "g", "id", k = 40)
    assert(tiny.count() == 3)
  }

  test("sampleKPerGroup aggregates map-side — no rank window in the plan") {
    val df = ids(1000).withColumn("g", (col("id") % 3).cast("string"))
    val out = Sampling.sampleKPerGroup(df, "g", "id", k = 10)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank window leaked into plan:\n$plan")
    out.count()
  }

  /** Skewed strata frame: sizes 2, 3, 10, 50 under strata a, b, c, d. */
  private def skewed = {
    val sizes = Seq("a" -> 2, "b" -> 3, "c" -> 10, "d" -> 50)
    sizes.zipWithIndex.flatMap { case ((g, n), i) =>
      (0 until n).map(j => (i * 1000L + j, g))
    }.toDF("id", "g")
  }

  test("quotaAllocate: hand-computed water level, budget conserved exactly") {
    // budget 20 over sizes 2,3,10,50: a,b fully kept (2+3), R=15 over 2
    // capped strata -> 7 each, remainder 1 to the first capped (c)
    val got = Sampling.quotaAllocate(skewed, "g", budget = 20L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("a" -> 2L, "b" -> 3L, "c" -> 8L, "d" -> 7L), s"got $got")
  }

  test("quotaAllocate: budget >= corpus keeps everything; 0 keeps nothing") {
    val all = Sampling.quotaAllocate(skewed, "g", budget = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(all == Map("a" -> 2L, "b" -> 3L, "c" -> 10L, "d" -> 50L))
    val none = Sampling.quotaAllocate(skewed, "g", budget = 0L)
      .collect().map(r => r.getLong(2)).toSeq
    assert(none == Seq(0L, 0L, 0L, 0L))
  }

  test("quotaAllocate conserves the budget across random skews") {
    // sum(alloc) == min(budget, total) and alloc_s <= n_s, always
    for (budget <- Seq(1L, 7L, 33L, 64L, 65L, 66L, 200L)) {
      val rows = Sampling.quotaAllocate(skewed, "g", budget).collect()
      val total = rows.map(_.getLong(1)).sum
      assert(rows.map(_.getLong(2)).sum == math.min(budget, total),
        s"budget $budget not conserved")
      assert(rows.forall(r => r.getLong(2) <= r.getLong(1)),
        s"allocation exceeds stratum size at budget $budget")
    }
  }

  test("quotaSample equals the naive per-stratum ranked prefix") {
    val naive = {
      import org.apache.spark.sql.expressions.Window
      val pr = (col("id") % 1000003L) * 1103515249L + 12345L
      val w = Window.partitionBy("g").orderBy(pr.asc, col("id").asc)
      skewed.withColumn("rank", row_number().over(w))
        .join(Sampling.quotaAllocate(skewed, "g", 20L), "g")
        .filter(col("rank") <= col("alloc"))
        .select(col("g"), col("id"), col("rank"))
    }
    val got = Sampling.quotaSample(skewed, "g", "id", budget = 20L)
    assert(got.collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2))).toSet ==
      naive.collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2))).toSet)
    assert(got.count() == 20L)
    // the CORPUS selection must ride the map-side-capped aggregator (the
    // only windows in the plan are quotaAllocate's bounded strata-frame
    // ones — a row_number over corpus rows would shuffle every row to its
    // stratum's reducer)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("topkaggregator") &&
      plan.contains("partial_topkaggregator"),
      s"selection must use the map-side-capped top-k aggregator:\n$plan")
  }

  // ---- weightedSample (Efraimidis–Spirakis) ----

  /** Scala reference of the identical clock: q25 polynomial hash of the
    * id string, u in (0, 1], e = −ln(u)/w. */
  private def esKey(id: Long, w: Long): Double = {
    val h = id.toString.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    -math.log((h + 1) / 1000000008.0) / w
  }

  private def esRun(rows: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Sampling.weightedSample(rows.toDF("id", "w"), "id", "w", k)
      .select("id", "keep").as[(Long, Long)].collect().toMap

  test("weightedSample matches a from-scratch reference selection exactly") {
    val rows = (1L to 200L).map(i => (i, 1L + i % 17))
    val expect = rows.sortBy { case (id, w) => (esKey(id, w), id) }
      .take(25).map(_._1).toSet
    val got = esRun(rows, 25)
    assert(got.count(_._2 == 1L) == 25)
    assert(got.filter(_._2 == 1L).keySet == expect)
  }

  test("weightedSample: an overwhelming weight is always selected") {
    val rows = (1L to 50L).map(i => (i, 1L)) :+ (99L, 1000000000L)
    assert(esRun(rows, 5)(99L) == 1L)
  }

  test("weightedSample selection is invariant under weight rescaling") {
    val rows = (1L to 100L).map(i => (i, 1L + i % 7))
    val a = esRun(rows, 10).filter(_._2 == 1L).keySet
    val b = Sampling.weightedSample(
      rows.map { case (i, w) => (i, w * 1000L) }.toDF("id", "w"),
      "id", "w", 10)
      .select("id", "keep").as[(Long, Long)].collect().toMap
      .filter(_._2 == 1L).keySet
    assert(a == b)
  }

  test("weightedSample is partitioning-invariant and emits every row") {
    val rows = (1L to 120L).map(i => (i, 1L + i % 5))
    val a = esRun(rows, 30)
    val b = Sampling.weightedSample(rows.toDF("id", "w").repartition(7),
        "id", "w", 30)
      .select("id", "keep").as[(Long, Long)].collect().toMap
    assert(a == b && a.size == 120)
  }

  test("weightedSample: zero/negative weights never win (a negative clock " +
    "would deterministically beat every legitimate row)") {
    val rows = (1L to 20L).map(i => (i, 2L)) ++
      Seq((100L, -1L), (101L, 0L), (102L, -999L))
    val got = esRun(rows, 5)
    // every row still comes back, the poisoned ones flagged keep=0
    assert(got.size == 23)
    assert(got(100L) == 0L && got(101L) == 0L && got(102L) == 0L)
    assert(got.count(_._2 == 1L) == 5)
    assert(got.filter(_._2 == 1L).keySet.forall(_ <= 20L))
  }

  test("topFracByScore: a threshold landing in the NULL-score bucket keeps " +
    "the group's top k, not zero rows") {
    // group g: scores [5, 4, null, null], frac 3/4 → k=3 → threshold row
    // is the NULL bucket (desc puts nulls last); the group must emit the
    // two scored rows plus ONE null row (tie-rationed by id), never 0
    val df = Seq(
      ("g", Some(5L), 1L), ("g", Some(4L), 2L),
      ("g", None, 3L), ("g", None, 4L),
      ("h", Some(9L), 5L), ("h", Some(8L), 6L),
      ("h", Some(7L), 7L), ("h", Some(6L), 8L))
      .toDF("grp", "score", "id")
    val got = Sampling.topFracByScore(df, "grp", "score", "id", 3, 4)
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(got == Set(("g", 1L), ("g", 2L), ("g", 3L),
      ("h", 5L), ("h", 6L), ("h", 7L)), s"got $got")
  }

  test("quotaSample's null-safe allocation join stays a broadcast HASH " +
    "join (EqualNullSafe is an equi-key, not a nested-loop condition)") {
    val df = (1L to 100L).map(i => (s"s${i % 5}", i)).toDF("src", "id")
    val out = Sampling.quotaSample(df, "src", "id", 50L)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"allocation join demoted:\n${plan.take(2500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"null-safe join fell to BNLJ:\n${plan.take(2500)}")
  }

  test("quotaSample: a NULL stratum keeps its allocation (null-safe join) " +
    "and NULL ids are excluded without crashing") {
    val df = (1L to 10L).map(i => (if (i <= 4) null else "s", i))
      .toDF("src", "id")
    val got = Sampling.quotaSample(df, "src", "id", budget = 100L)
      .select("src", "id").as[(String, Long)].collect()
    // budget covers everything: all 10 rows return, 4 under the NULL
    // stratum — the equi-join regression dropped those entirely
    assert(got.length == 10)
    assert(got.count(_._1 == null) == 4)
    // a NULL id row must not NPE the typed encoder; it is excluded (the
    // hashBp convention), everything else intact
    val dirty = df.unionByName(
      Seq(("s", Option.empty[Long])).toDF("src", "id"))
    val got2 = Sampling.quotaSample(dirty, "src", "id", budget = 100L)
      .select("id").as[Long].collect().toSet
    assert(got2 == (1L to 10L).toSet)
  }
}
