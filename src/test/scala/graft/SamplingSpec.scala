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
}
