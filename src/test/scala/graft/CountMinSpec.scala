package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountMinAggregator, CountMinSketch}

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val D = 4
  private val W = 8192

  private def sketchOf(tokens: Seq[String], parts: Int): Array[Long] =
    tokens.toDF("tok").repartition(parts)
      .select(xxhash64(col("tok")).as("h")).as[Long]
      .select(new CountMinAggregator(D, W).toColumn).head()

  test("estimates never undercount, and are exact for a tiny key set") {
    val tokens = Seq.fill(90)("alpha") ++ Seq.fill(9)("beta") ++ Seq("gamma")
    val sk = sketchOf(tokens, 4)
    def est(t: String) =
      CountMinSketch.estimate(sk, CountMinSketch.hashString(t), D, W)
    // 3 distinct keys in 4×8192 cells: no collisions, estimates are exact
    assert(est("alpha") == 90L && est("beta") == 9L && est("gamma") == 1L)
    // an absent key reads whatever its cells hold — here, empty cells
    assert(est("delta") == 0L)
  }

  test("the epsilon bound holds on real tokens: exact <= est <= exact+eps*N") {
    val toks = graft.sources.Tables.documents(spark, sfDir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val n = toks.count()
    val sk = toks.select(xxhash64(col("tok")).as("h")).as[Long]
      .select(new CountMinAggregator(D, W).toColumn).head()
    val eps = math.E / W
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("tok")).limit(100)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    exact.foreach { case (t, c) =>
      val e = CountMinSketch.estimate(sk, CountMinSketch.hashString(t), D, W)
      assert(e >= c, s"undercount for '$t': $e < $c")
      assert(e <= c + (eps * n).toLong + 1,
        s"eps bound broken for '$t': $e vs $c + ${(eps * n).toLong}")
    }
  }

  test("sketch is partitioning-invariant (cells are sums)") {
    val tokens = (1 to 2000).map(i => s"tok${i % 97}")
    assert(sketchOf(tokens, 1).toSeq == sketchOf(tokens, 17).toSeq)
  }

  test("merge of disjoint-corpus sketches equals the union sketch") {
    val a = Seq.fill(40)("x") ++ Seq.fill(7)("y")
    val b = Seq.fill(13)("y") ++ Seq.fill(5)("z")
    val agg = new CountMinAggregator(D, W)
    val m = agg.merge(sketchOf(a, 3), sketchOf(b, 2))
    assert(m.toSeq == sketchOf(a ++ b, 5).toSeq)
  }

  test("plan: map-side partial aggregation, keys never shuffled") {
    val df = (1 to 500).map(i => s"t${i % 11}").toDF("tok")
      .select(xxhash64(col("tok")).as("h")).as[Long]
      .select(new CountMinAggregator(D, W).toColumn)
    val plan = df.queryExecution.executedPlan.toString
    // partial + final typed aggregate around a single-partition exchange
    assert(plan.contains("SinglePartition") || plan.contains("Exchange"))
    val firstAgg = plan.indexOf("Aggregate")
    assert(firstAgg >= 0 && plan.indexOf("Aggregate", firstAgg + 1) > 0,
      s"aggregation not split partial/final:\n$plan")
  }
}
