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
