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
    * pass = 1 iff violations ≤ maxViolations. Rows come back in EXACTLY
    * the declared order, interleavings included — each rule carries its
    * declared index through the union and the (rule-count-bounded) final
    * sort. Rule/column names are attached as `lit` columns, never
    * interpolated into SQL text, so names containing quotes cannot break
    * expression parsing. Consumers usually filter pass = 0. */
  def audit(df: DataFrame, rules: Seq[Rule],
            maxViolations: Long = 0L): DataFrame = {
    require(rules.nonEmpty, "audit needs at least one rule")
    val rowRules = rules.zipWithIndex.collect {
      case (NotNull(c), i) => (i, "not_null", c,
        sum(when(col(c).isNull, 1L).otherwise(0L)))
      case (InRange(c, lo, hi), i) => (i, "in_range", c,
        sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
          .otherwise(0L)))
      case (Matches(c, re), i) => (i, "matches", c,
        sum(when(col(c).isNotNull && !col(c).rlike(re), 1L).otherwise(0L)))
    }
    val rowFrame: Option[DataFrame] =
      if (rowRules.isEmpty) None
      else {
        val aggd = df.agg(rowRules.head._4.as("m0"),
          rowRules.tail.zipWithIndex.map { case (r, j) =>
            r._4.as(s"m${j + 1}") }: _*)
        // stack melts the ONE aggregated row into one row per rule — no
        // re-aggregation, the table is scanned exactly once. Only the
        // local ordinal and the measure alias enter the SQL string; the
        // declared index / rule / column attach via element_at over lit
        // arrays (position __j + 1), immune to quoting
        val stackArgs = rowRules.indices.map(j => s"$j, m$j").mkString(", ")
        val stacked = aggd.select(expr(
          s"stack(${rowRules.size}, $stackArgs) AS (__j, violations)"))
        Some(stacked.select(
          element_at(array(rowRules.map(r => lit(r._1)): _*),
            col("__j") + 1).as("__i"),
          element_at(array(rowRules.map(r => lit(r._2)): _*),
            col("__j") + 1).as("rule"),
          element_at(array(rowRules.map(r => lit(r._3)): _*),
            col("__j") + 1).as("column"),
          col("violations")))
      }
    val uniqFrames = rules.zipWithIndex.collect { case (Unique(c), i) =>
      df.filter(col(c).isNotNull).groupBy(col(c)).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1L)
        .agg(coalesce(sum(col("n")), lit(0L)).as("violations"))
        .select(lit(i).as("__i"), lit("unique").as("rule"),
          lit(c).as("column"), col("violations"))
    }
    (rowFrame.toSeq ++ uniqFrames).reduce(_.unionAll(_))
      .orderBy("__i").drop("__i")
      .withColumn("pass",
        when(col("violations") <= maxViolations, 1L).otherwise(0L))
  }
}
