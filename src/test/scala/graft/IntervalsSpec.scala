package graft

import org.apache.spark.sql.functions._

import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], width: Long) =
    Intervals.coverage(rows.toDF("user_id", "ts_us"),
      Seq("user_id"), "ts_us", width)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("overlapping intervals merge; disjoint ones do not") {
    // width 10: [0,10) [5,15) merge to [0,15); [100,110) stands alone
    val out = run(Seq((1L, 0L), (1L, 5L), (1L, 100L)), width = 10L)
    assert(out == Map(1L -> ((2L, 25L))))
  }

  test("touching intervals merge (half-open semantics)") {
    // [0,10) and [10,20) touch -> one segment of 20
    val out = run(Seq((1L, 0L), (1L, 10L)), width = 10L)
    assert(out == Map(1L -> ((1L, 20L))))
  }

  test("burst of duplicate timestamps is one segment of one width") {
    val out = run(Seq.fill(100)((1L, 42L)), width = 7L)
    assert(out == Map(1L -> ((1L, 7L))))
  }

  test("keys are independent") {
    val out = run(Seq((1L, 0L), (2L, 0L), (2L, 50L)), width = 10L)
    assert(out == Map(1L -> ((1L, 10L)), 2L -> ((2L, 20L))))
  }

  test("chain of overlaps spanning many rows folds to one segment") {
    // steps of 6 with width 10: every next start is inside the union
    val rows = (0 until 50).map(i => (1L, i * 6L))
    val out = run(rows, width = 10L)
    assert(out == Map(1L -> ((1L, 49L * 6L + 10L))))
  }

  test("partitioning-invariant and matches a local sweep on real events") {
    val ev = graft.sources.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val w = 1800000000L
    def spark32(p: Int) = Intervals.coverage(ev.repartition(p),
      Seq("user_id"), "ts_us", w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = spark32(32)
    assert(got == spark32(1))
    val local = ev.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues { es =>
        val ss = es.map(_._2).sorted
        var n = 0L; var cov = 0L
        var segS = Long.MinValue; var segE = Long.MinValue
        ss.foreach { t =>
          if (t > segE) {
            if (segE != Long.MinValue) { n += 1; cov += segE - segS }
            segS = t; segE = t + w
          } else segE = math.max(segE, t + w)
        }
        if (segE != Long.MinValue) { n += 1; cov += segE - segS }
        (n, cov)
      }.toMap
    assert(got == local)
  }

  test("plan: one exchange; the segment aggs reuse the window partitioning") {
    val df = (1 to 100).map(i => (i.toLong % 5, i.toLong * 3))
      .toDF("user_id", "ts_us")
    val p = Intervals.coverage(df, Seq("user_id"), "ts_us", 10L)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$p")
  }
}
