package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality rule audit — the validation gate a pipeline
  * runs on a table BEFORE it feeds training (the Deequ/Great-Expectations
  * role, engine-native): completeness, range, format and uniqueness
  * constraints declared as data, evaluated in bulk, one verdict row per
  * rule. A corpus refresh that fails the gate never reaches the mixer.
  *
  * Execution shape is the whole point at 100 TB: every ROW rule
  * (not-null / in-range / matches) compiles to a conditional-sum in ONE
  * map-side-combined single-row aggregate over ONE scan — adding rules
  * adds expressions, not passes (the melt back to one-row-per-rule is a
  * `stack` over that single aggregated row, not re-aggregation).
  * UNIQUENESS is the one rule class that genuinely needs a shuffle (a
  * per-value count on its column); each unique rule runs its own
  * key-bounded aggregate and the verdict frames union. Violations are
  * exact int64 counts — no sampling, no sketch — so pass/fail is
  * deterministic and engine-replayable.
  */
object QualityRules {

  sealed trait Rule { def column: String }
  /** NULL values violate. */
  final case class NotNull(column: String) extends Rule
  /** Non-null values outside [lo, hi] violate; NULLs pass (pair with
    * [[NotNull]] when absence itself is a defect). */
  final case class InRange(column: String, lo: Long, hi: Long) extends Rule
  /** Non-null values NOT matching `regex` (unanchored find, Spark
    * `rlike` semantics) violate; NULLs pass. */
  final case class Matches(column: String, regex: String) extends Rule
  /** Non-null values occurring more than once violate (every row of a
    * duplicated value counts); NULLs pass. */
  final case class Unique(column: String) extends Rule

  /** One verdict row per rule: (rule, column, violations, pass) with
    * pass = 1 iff violations ≤ maxViolations. Rule order is preserved in
    * the declared order via union; consumers usually filter pass = 0. */
  def audit(df: DataFrame, rules: Seq[Rule],
            maxViolations: Long = 0L): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowRules = rules.collect {
      case NotNull(c) => ("not_null", c,
        sum(when(col(c).isNull, 1L).otherwise(0L)))
      case InRange(c, lo, hi) => ("in_range", c,
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)))
      case Matches(c, re) => ("matches", c,
        sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L)))
    }
    val rowFrame: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggd = df.agg(rowRules.head._3.as("m0"),
          rowRules.tail.zipWithIndex.map { case (r, i) =>
            r._3.as(s"m${i + 1}") }: _*)
        // stack melts the ONE aggregated row into one row per rule —
        // no re-aggregation, the table is scanned exactly once
        val stackArgs = rowRules.zipWithIndex.map { case ((n, c, _), i) =>
          s"'$n', '$c', m$i" }.mkString(", ")
        Some(aggd.select(expr(
          s"stack(${rowRules.size}, $stackArgs) AS (rule, column, violations)")))
      }
    val uniqFrames = rules.collect { case Unique(c) =>
      df.filter(col(c).isNotNull).groupBy(col(c)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1L)
        .agg(coalesce(sum(col("n")), lit(0L)).as("violations"))
        .select(lit("unique").as("rule"), lit(c).as("column"),
          col("violations"))
    }
    (rowFrame.toSeq ++ uniqFrames).reduce(_.unionAll(_))
      .withColumn("pass",
        when(col("violations") <= maxViolations, 1L).otherwise(0L))
  }
}
