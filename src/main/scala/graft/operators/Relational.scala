package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational preprocessing / EDA operators.
  *
  * Covers the reference's DataFrame surface: cast-label + dropna + projection
  * (/root/reference/Yelp_Data_PreProcessing.py:60-62), left enrich joins
  * (:97,103), elite-flag fill (/root/reference/Scalable_Project_SVM_Model_Deployment.py:68,81),
  * explode/split + top-N (/root/reference/Scalable_EDA_Final.py:178-189) and
  * the RDD `.histogram(10)` (:140-146) re-expressed as a declarative
  * width-bucket aggregation.
  *
  * Scale notes: every operator is a pure `DataFrame → DataFrame` plan
  * fragment, so Catalyst gets pushdown/pruning for free. Dimension sides of
  * enrich joins are broadcast by default (user/business-style dims stay small
  * relative to the fact side at any scale factor); fact⋈fact joins fall back
  * to shuffle joins with AQE skew handling.
  */
object Relational {

  /** stars → double label (ref Yelp_Data_PreProcessing.py:60). */
  def withLabel(df: DataFrame, src: String, dst: String = "label"): DataFrame =
    df.withColumn(dst, col(src).cast("double"))

  /** dropna on a column subset (ref Yelp_Data_PreProcessing.py:61). */
  def dropNaSubset(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** Column projection (ref Yelp_Data_PreProcessing.py:62). */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** withColumnRenamed (ref Scalable_Project_SVM_Model_Deployment.py:106). */
  def rename(df: DataFrame, from: String, to: String): DataFrame =
    df.withColumnRenamed(from, to)

  /** Left-outer enrich of a fact table with a dimension
    * (ref Yelp_Data_PreProcessing.py:97,103). Dim is broadcast by default:
    * at 100 TB the fact side dominates and the dim fits in executor memory,
    * so this avoids shuffling the fact table entirely. */
  def leftEnrich(fact: DataFrame, dim: DataFrame, joinExpr: Column,
                 bcast: Boolean = true): DataFrame =
    fact.join(if (bcast) broadcast(dim) else dim, joinExpr, "left")

  /** when(isNull, default).otherwise(col) flag fill
    * (ref Scalable_Project_SVM_Model_Deployment.py:81). */
  def flagFill(df: DataFrame, flagCol: String, default: Column): DataFrame =
    df.withColumn(flagCol,
      when(col(flagCol).isNull, default).otherwise(col(flagCol)))

  /** explode(split(col, delim)) (ref Scalable_EDA_Final.py:178). */
  def explodeDelimited(df: DataFrame, src: String, out: String,
                       delim: String): DataFrame =
    df.withColumn(out, explode(split(col(src), delim)))

  /** groupBy-count-orderBy(desc)-limit top-N with a deterministic tiebreak on
    * the key (ref Scalable_EDA_Final.py:187-189). Partial (map-side)
    * aggregation makes the shuffle carry only distinct keys. */
  def topNByCount(df: DataFrame, key: String, n: Int): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc(key))
      .limit(n)

  /** Skew-resistant equi-join: the fact side's hot keys would overwhelm
    * single reducers in a plain shuffle join, so each fact row gets a
    * deterministic salt in [0, saltFactor) and the (small) other side is
    * replicated once per salt value — the shuffle key becomes (key, salt),
    * spreading each hot key over saltFactor reducers. Complementary to AQE
    * skew-join splitting: salting also covers aggregations-after-join and
    * engines/paths where AQE can't split (e.g. a following groupBy on the
    * same key). `other` is replicated ×saltFactor — keep it the dimension
    * side. */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would emit every unmatched `other` row once per salt
    // replica — reject join types whose output depends on the replication
    require(Set("inner", "left", "left_outer", "left_semi", "left_anti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti, got $joinType")
    // the salt must vary WITHIN a key (that's the whole point) — a seeded
    // uniform draw per row does; join output is salt-value-independent
    val salted = fact.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Hierarchical corpus report: `ROLLUP(g1, g2)` — per-(g1, g2), per-g1
    * subtotal, and grand-total rows in ONE aggregation. Spark expands the
    * rollup into a single Expand + hash aggregate, and partial (map-side)
    * aggregation applies per grouping set — the shuffle carries at most
    * (distinct keys × 3 grouping sets) rows per partition, never the data.
    * Sums are computed on the long-cast value so they stay exact at any
    * scale (no double association-order drift). */
  def rollupStats(df: DataFrame, g1: String, g2: String,
                  valueCol: String): DataFrame =
    df.rollup(g1, g2).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("long")).as("v_sum"))

  /** CUBE grouping sets — the slice-and-dice completion of [[rollupStats]]'s
    * hierarchy: detail + BOTH single-axis subtotals + grand total in one
    * Expand + hash aggregate (each grouping set partially aggregates
    * map-side, same as ROLLUP). `gid` is `grouping_id()` — bit 1 = g1
    * aggregated, bit 0 = g2 — so subtotal rows are distinguishable from
    * genuine NULL group values, the ambiguity that makes bare NULL-keyed
    * cube output unsafe to consume. */
  def cubeStats(df: DataFrame, g1: String, g2: String,
                valueCol: String): DataFrame =
    df.cube(g1, g2).agg(
      grouping_id().cast("long").as("gid"),
      count(lit(1)).as("n"),
      sum(col(valueCol).cast("long")).as("v_sum"))

  /** Pivot with an EXPLICIT value list: `groupBy(key).pivot(p, values)
    * .count()`, missing cells zero-filled. Passing `values` matters twice
    * at scale: it skips the eager distinct-collect job Spark otherwise runs
    * over the whole input just to discover column names, and it freezes the
    * output schema (a rerun over new data cannot sprout columns and break
    * downstream readers). One shuffle, keyed on `key` alone — the pivot
    * values become conditional aggregates, not part of the shuffle key. */
  def pivotCounts(df: DataFrame, key: String, pivotCol: String,
                  values: Seq[String]): DataFrame = {
    require(values.nonEmpty, "pivotCounts needs an explicit value list")
    val p = df.groupBy(key).pivot(pivotCol, values).agg(count(lit(1)))
    values.foldLeft(p)((acc, v) =>
      acc.withColumn(v, coalesce(col(s"`$v`"), lit(0L))))
  }

  /** Equal-width histogram of a numeric column, the declarative re-expression
    * of the reference's `rdd.flatMap(...).histogram(10)`
    * (ref Scalable_EDA_Final.py:140-146). Two passes over the column: one
    * tiny min/max agg (broadcast back as a single row), one bucket-count agg.
    * No RDD round-trip, no driver materialization.
    */
  def histogram(df: DataFrame, value: Column, nBuckets: Int): DataFrame = {
    // both passes (min/max, bucket counts) consume `vals`; persist the
    // single-double-column frame so an expensive upstream expression (regex
    // tokenization, say) is evaluated once, not once per pass. Lifecycle
    // contract: the returned frame is lazy, so the operator cannot
    // unpersist — long-lived sessions calling this (or the dedup
    // operators) repeatedly should `spark.catalog.clearCache()` between
    // batches, as Verify/Bench do; otherwise eviction is LRU.
    val vals = df.select(value.cast("double").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mm = vals.agg(min(col("v")).as("minv"), max(col("v")).as("maxv"))
    vals.crossJoin(broadcast(mm))
      .select(
        when(col("maxv") === col("minv"), lit(0))
          .otherwise(least(lit(nBuckets - 1),
            floor((col("v") - col("minv")) * nBuckets / (col("maxv") - col("minv")))
              .cast("int")))
          .as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("freq"))
  }
}
