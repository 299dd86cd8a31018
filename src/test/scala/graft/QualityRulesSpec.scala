package graft

import org.apache.spark.sql.functions._

import graft.operators.QualityRules
import graft.operators.QualityRules._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("alpha"), Some(10L), Some("en")),
    (2L, Some("beta"), Some(-3L), Some("de")),     // range violation
    (3L, None, Some(20L), Some("fr")),             // null text
    (4L, Some("alpha"), Some(30L), Some("EN")),    // dup text + bad lang
    (5L, Some("gamma"), None, Some("pt")))         // null range col: passes
    .toDF("id", "text", "n", "lang")

  private def run(rules: Seq[Rule], maxV: Long = 0L) =
    QualityRules.audit(df, rules, maxV)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("each rule class counts exactly its violations") {
    val got = run(Seq(
      NotNull("text"), InRange("n", 0L, 100L), Matches("lang", "^[a-z]{2}$"),
      Unique("id"), Unique("text")))
    assert(got(("not_null", "text")) == ((1L, 0L)))
    assert(got(("in_range", "n")) == ((1L, 0L)))       // -3 only; NULL passes
    assert(got(("matches", "lang")) == ((1L, 0L)))     // "EN" only
    assert(got(("unique", "id")) == ((0L, 1L)))
    // "alpha" occurs twice → BOTH rows violate; NULL text passes
    assert(got(("unique", "text")) == ((2L, 0L)))
  }

  test("maxViolations relaxes the gate without changing counts") {
    val got = run(Seq(Unique("text")), maxV = 2L)
    assert(got(("unique", "text")) == ((2L, 1L)))
  }

  test("all row rules share ONE aggregate: a single scan, no shuffle fan") {
    val audit = QualityRules.audit(df,
      Seq(NotNull("text"), InRange("n", 0L, 100L), Matches("lang", "x")))
    val plan = audit.queryExecution.executedPlan.toString
    // one aggregate pair (partial+final) for all three rules
    assert("HashAggregate|SortAggregate".r.findAllIn(plan).size <= 2 ||
      plan.contains("stack"), plan.take(1500))
    assert(audit.count() == 3L)
  }

  test("streaming monitor rollup equals the batch audit for row rules, " +
    "and simulated retry partials collapse") {
    import graft.streaming.ScoringStream
    val rules = Seq(NotNull("text"), InRange("n", 0L, 100L),
      Matches("lang", "^[a-z]{2}$"))
    val tmp = java.nio.file.Files.createTempDirectory("rulemon").toString
    df.repartition(3).write.mode("overwrite").parquet(s"$tmp/src")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/src").schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/src")
    ScoringStream.monitorRulesStream(stream, rules,
      s"$tmp/mon", s"$tmp/ckpt")
    // a retried batch re-appends identical partials: duplicate batch 0's
    // rows and expect the rollup to absorb them
    val mon = spark.read.parquet(s"$tmp/mon")
    mon.filter(col("batch_id") === 0L).write.mode("append")
      .parquet(s"$tmp/mon")
    val got = ScoringStream.readRulesMonitor(spark, s"$tmp/mon")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val batch = QualityRules.audit(df, rules)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == batch, s"stream=$got batch=$batch")
  }

  test("streaming monitor refuses non-additive uniqueness rules") {
    import graft.streaming.ScoringStream
    val tmp = java.nio.file.Files.createTempDirectory("rulemon2").toString
    df.write.mode("overwrite").parquet(s"$tmp/src")
    val err = intercept[IllegalArgumentException] {
      ScoringStream.monitorRulesStream(
        spark.readStream.schema(df.schema).parquet(s"$tmp/src"),
        Seq(Unique("id")), s"$tmp/mon", s"$tmp/ckpt")
    }
    assert(err.getMessage.contains("additive"))
  }

  test("streaming monitor refuses two rules of one type on one column " +
    "(their partials would collide in the retry-collapse)") {
    import graft.streaming.ScoringStream
    val tmp = java.nio.file.Files.createTempDirectory("rulemon3").toString
    df.write.mode("overwrite").parquet(s"$tmp/src")
    val err = intercept[IllegalArgumentException] {
      ScoringStream.monitorRulesStream(
        spark.readStream.schema(df.schema).parquet(s"$tmp/src"),
        Seq(Matches("text", "^a"), Matches("text", "b$")),
        s"$tmp/mon", s"$tmp/ckpt")
    }
    assert(err.getMessage.contains("one rule per"))
    // distinct (type, column) pairs — incl. two of one type on DIFFERENT
    // columns — still pass the guard and stream normally
    ScoringStream.monitorRulesStream(
      spark.readStream.schema(df.schema).parquet(s"$tmp/src"),
      Seq(Matches("text", "^a"), NotNull("text"), NotNull("id")),
      s"$tmp/mon2", s"$tmp/ckpt2")
    assert(ScoringStream.readRulesMonitor(spark, s"$tmp/mon2")
      .count() == 3)
  }

  test("declared order is preserved even when unique rules interleave " +
    "row rules, and quoted column names cannot break the melt") {
    val got = QualityRules.audit(df, Seq(
      Unique("text"), NotNull("text"), Unique("id"), InRange("n", 0L, 100L)))
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq(
      ("unique", "text"), ("not_null", "text"),
      ("unique", "id"), ("in_range", "n")), got.mkString(","))
    // a column whose NAME contains a single quote: attached via lit, so
    // the stack SQL never sees it
    val quoted = Seq((1L, "x"), (2L, null.asInstanceOf[String]))
      .toDF("id", "it's")
    val q = QualityRules.audit(quoted, Seq(NotNull("it's")))
      .as[(String, String, Long, Long)].collect()
    assert(q.toSeq == Seq(("not_null", "it's", 1L, 0L)))
  }

  test("a clean table passes every rule") {
    val got = run(Seq(NotNull("text"), Unique("id")))
      .filter { case ((r, c), _) => c == "id" || r == "not_null" }
    val clean = QualityRules.audit(
      Seq((1L, "a"), (2L, "b")).toDF("id", "text"),
      Seq(NotNull("text"), Unique("id"), Unique("text")))
      .as[(String, String, Long, Long)].collect()
    assert(clean.forall(r => r._3 == 0L && r._4 == 1L))
    assert(got.nonEmpty)
  }
}
