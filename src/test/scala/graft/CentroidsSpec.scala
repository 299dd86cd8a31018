package graft

import org.apache.spark.sql.functions._

import graft.similarity.Centroids
import graft.sources.Tables

class CentroidsSpec extends SparkSpec {
  import spark.implicits._

  test("labelSums matches a hand-computed centroid") {
    val emb = Seq(
      (0, Array(1.0f, -0.5f)),
      (0, Array(0.25f, 0.5f)),
      (1, Array(2.0f, 2.0f))).toDF("label", "embedding")
    val out = Centroids.labelSums(emb, "label", "embedding")
      .as[(Int, Int, Long, Long)].collect()
      .map { case (l, p, n, s) => (l, p) -> ((n, s)) }.toMap
    // floor(x·10⁶) per component, summed as int64
    assert(out((0, 0)) == ((2L, 1250000L)))   // 1000000 + 250000
    assert(out((0, 1)) == ((2L, 0L)))         // -500000 + 500000
    assert(out((1, 0)) == ((1L, 2000000L)))
    assert(out((1, 1)) == ((1L, 2000000L)))
  }

  test("negative components floor toward -inf (matches SQL FLOOR)") {
    val emb = Seq((0, Array(-0.0000015f))).toDF("label", "embedding")
    val s = Centroids.labelSums(emb, "label", "embedding")
      .select("sum_uu").as[Long].head()
    // -0.0000015f promotes to ~-1.5e-6; floor(-1.5) = -2
    assert(s == -2L)
  }

  test("aggregation is partial (map-side combine before the exchange)") {
    val emb = Tables.embeddings(spark, sfDir)
    val out = Centroids.labelSums(emb, "label", "embedding")
    val plan = out.queryExecution.executedPlan.toString
    // two HashAggregates around one Exchange = partial + final
    assert(plan.contains("Exchange"), plan)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"no partial aggregation:\n$plan")
    // one row per (label, pos): 10 labels × dim
    val dim = emb.select(size(col("embedding"))).as[Int].head()
    assert(out.count() == emb.select("label").distinct().count() * dim)
  }
}
