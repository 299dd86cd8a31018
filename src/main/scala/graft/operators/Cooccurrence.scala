package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining — support / confidence / lift for
  * item pairs over baskets (user-day carts, session page sets, doc tag
  * sets): the association-rule read behind "users who touched A touch B",
  * recommender candidate generation, and redundant-feature detection.
  * All statistics are exact integers: with N baskets, n_a/n_b item
  * basket counts and n_ab the pair count,
  * support_bp = 10000·n_ab div N, conf (A→B) = 10000·n_ab div n_a,
  * lift_m = 1000·N·n_ab div (n_a·n_b) (1000 ≈ independent, higher =
  * associated), jaccard_bp = 10000·n_ab div (n_a + n_b − n_ab). Pairs
  * are unordered (a < b); both directed confidences ride on the one row.
  *
  * Scale shape: baskets reduce to DISTINCT (basket, item) incidence
  * first (type counting, not occurrence counting — the row-215 rule);
  * the pair generation is an equi self-join ON BASKET with a < b inside
  * the join — work is Σ_b k_b², bounded by the declared per-basket item
  * cap (`maxBasketItems`, oversized baskets EXCLUDED loudly as the
  * standard basket-cap contract: a 10⁴-item power basket would dominate
  * the quadratic and its associations are noise anyway). Item counts and
  * the N attach are one aggregate each; N broadcasts (single-row
  * attach). Never an all-pairs join across baskets.
  */
object Cooccurrence {

  /** (item_a, item_b, n_a, n_b, n_ab, support_bp, conf_ab_bp,
    * conf_ba_bp, jaccard_bp, lift_m) for unordered in-cap pairs. */
  def itemPairs(df: DataFrame, basketCol: String, itemCol: String,
                maxBasketItems: Int = 64,
                minPairCount: Long = 1L): DataFrame = {
    require(maxBasketItems >= 2, "maxBasketItems must be >= 2")
    // incidence feeds the basket-cap aggregate and the capped join; the
    // capped frame feeds N, item counts and BOTH self-join sides —
    // materialize each once (Guards.materialize: lazy sharing is raced
    // into per-consumer recomputes by concurrent AQE stage jobs)
    val inc = graft.Guards.materialize(df
      .filter(col(basketCol).isNotNull && col(itemCol).isNotNull)
      .select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct())
    val keptBaskets = inc.groupBy("__b")
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") <= maxBasketItems)
      .select("__b")
    val kept = graft.Guards.materialize(inc.join(keptBaskets, Seq("__b")))
    val nBaskets = kept.select("__b").distinct()
      .agg(count(lit(1)).as("__n"))
    val itemCounts = kept.groupBy(col("__i"))
      .agg(count(lit(1)).as("__ni"))
    val pairs = kept.as("x")
      .join(kept.as("y"), col("x.__b") === col("y.__b") &&
        col("x.__i") < col("y.__i"))
      .groupBy(col("x.__i").as("item_a"), col("y.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    pairs
      .join(itemCounts.withColumnRenamed("__i", "item_a")
        .withColumnRenamed("__ni", "n_a"), Seq("item_a"))
      .join(itemCounts.withColumnRenamed("__i", "item_b")
        .withColumnRenamed("__ni", "n_b"), Seq("item_b"))
      .join(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        expr("(10000 * n_ab) div __n").as("support_bp"),
        expr("(10000 * n_ab) div n_a").as("conf_ab_bp"),
        expr("(10000 * n_ab) div n_b").as("conf_ba_bp"),
        expr("(10000 * n_ab) div (n_a + n_b - n_ab)").as("jaccard_bp"),
        // decimal(38,0) headroom (the row-202 convention): N·n_ab and
        // n_a·n_b are products of corpus-scale counts — plain int64
        // would wrap silently at web scale
        expr("(1000 * cast(__n as decimal(38,0)) * n_ab) div " +
          "(cast(n_a as decimal(38,0)) * n_b)").cast("long").as("lift_m"))
  }
}
