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

  test("streaming windowed centroids equal the batch math per window") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cent_src").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def T(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val b1 = Seq(
      (T(0), 0, Array(1.0f, 2.0f)),
      (T(1), 0, Array(3.0f, -1.0f)),
      (T(2), 1, Array(0.5f, 0.5f))).toDF("ts", "label", "embedding")
    // sentinel far ahead: advances the watermark so window 1 finalizes
    val b2 = Seq((T(48 * 60), 9, Array(0.0f, 0.0f)))
      .toDF("ts", "label", "embedding")
    b1.write.parquet(s"$tmp/f1")
    b2.write.parquet(s"$tmp/f2")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$tmp/f1").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/*")
    val out = graft.streaming.ScoringStream.runToMemory(spark,
      Centroids.labelSumsStream(stream, "label", "embedding", "ts",
        watermark = "1 hour", windowLen = "10 minutes"), "append")
      .filter(col("label") =!= 9)
    val got = out.select("label", "pos", "n", "sum_uu")
      .as[(Int, Int, Long, Long)].collect().toSet
    // batch twin over the same rows — identical integer math
    val batch = Centroids.labelSums(b1, "label", "embedding")
      .as[(Int, Int, Long, Long)].collect().toSet
    assert(got == batch)
    assert(got.contains((0, 0, 2L, 4000000L))) // 1e6 + 3e6
    assert(got.contains((0, 1, 2L, 1000000L))) // 2e6 + (-1e6)
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

  test("normAudit: exact micro-unit norms, zero vectors counted") {
    val df = Seq(
      (0, Seq(3.0f, 4.0f)),   // norm 5.0 → 5_000_000
      (0, Seq(0.0f, 0.0f)),   // zero vector
      (1, Seq(1.0f, 0.0f))
    ).toDF("label", "vec")
    val got = Centroids.normAudit(df, "label", "vec")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got(0) == ((2L, 0L, 5000000L, 5000000L, 1L)), s"got ${got(0)}")
    assert(got(1) == ((1L, 1000000L, 1000000L, 1000000L, 0L)))
  }

  test("dimAudit: dead and zero-heavy dimensions surface with exact " +
    "micro-unit stats, partitioning-invariant") {
    import org.apache.spark.sql.functions.col
    // dim 0 varies; dim 1 constant 0.5 (dead); dim 2 all zero (dead+zero)
    val emb = Seq(
      (1L, Seq(1.0f, 0.5f, 0.0f)),
      (2L, Seq(-2.5f, 0.5f, 0.0f)),
      (3L, Seq(0.25f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    def collect(df: org.apache.spark.sql.DataFrame) =
      Centroids.dimAudit(df, "embedding")
        .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val got = collect(emb)
    assert(got(0L) == ((3L, 0L, -2500000L, 1000000L, -1250000L, 0L)))
    assert(got(1L) == ((3L, 0L, 500000L, 500000L, 1500000L, 1L)))
    assert(got(2L) == ((3L, 3L, 0L, 0L, 0L, 1L)))
    assert(collect(emb.repartition(5)) == got)
  }

  test("dispersion: collapsed class has mean_pair == mean_self; " +
    "orthogonal class has mean_pair 0") {
    val emb = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)), (0, Seq(1.0f, 0.0f)),
      (1, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f)))
      .toDF("label", "embedding")
    val got = Centroids.dispersion(emb, "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    // class 0: all identical unit vectors -> self = pair = 1e12
    assert(got(0) == ((3L, 1000000000000L, Some(1000000000000L))),
      got.toString)
    // class 1: orthogonal -> pair dot 0
    assert(got(1) == ((2L, 1000000000000L, Some(0L))))
  }

  test("dispersion: anti-correlated class goes negative; " +
    "singleton class reports NULL mean_pair") {
    val emb = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(-1.0f, 0.0f)),
      (1, Seq(0.5f, 0.5f)))
      .toDF("label", "embedding")
    val got = Centroids.dispersion(emb, "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Long])))
      .toMap
    // (+1e6, -1e6): S = 0, T = 2e12 -> pair = -2e12 / 2 = -1e12
    assert(got(0) == ((2L, 1000000000000L, Some(-1000000000000L))),
      got.toString)
    assert(got(1)._3.isEmpty)
  }

  test("centroidAssign: queries take the nearest mean class vector with " +
    "deterministic (score, label) tie-break") {
    val labeled = Seq(
      (0, Seq(1.0f, 0.0f)), (0, Seq(0.8f, 0.2f)),   // class 0 ~ x-axis
      (1, Seq(0.0f, 1.0f)), (1, Seq(0.2f, 0.8f)))   // class 1 ~ y-axis
      .toDF("label", "embedding")
    val queries = Seq(
      (10L, Seq(0.9f, 0.1f)),  // -> 0
      (11L, Seq(0.1f, 0.9f)),  // -> 1
      (12L, Seq(0.5f, 0.5f)))  // symmetric: equal scores -> label 0
      .toDF("vec_id", "embedding")
    val got = Centroids.centroidAssign(queries, "vec_id", "embedding",
      labeled, "label", "embedding")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(10L -> 0, 11L -> 1, 12L -> 0), got.toString)
  }

  test("centroidAssign: anti-aligned queries score negative and still " +
    "pick the least-bad class; centroids broadcast") {
    val labeled = Seq((0, Seq(1.0f, 0.0f)), (1, Seq(0.5f, 0.5f)))
      .toDF("label", "embedding")
    val queries = Seq((10L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Centroids.centroidAssign(queries, "vec_id", "embedding",
      labeled, "label", "embedding")
    val r = out.collect().head
    // dots: class 0 = -1e12 (score -1e12·1e6/1), class 1 = -5e11
    assert(r.getInt(1) == 1, r.toString)
    assert(r.getLong(2) < 0L)
    assert(out.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"),
      out.queryExecution.executedPlan.toString)
  }

  test("dispersion is partitioning-invariant (exact integer math)") {
    val emb = (1 to 40).map(i =>
      (i % 3, Seq(i * 0.01f, 1.0f - i * 0.02f, (i % 7) * 0.1f)))
      .toDF("label", "embedding")
    def run(p: Int) = Centroids.dispersion(emb.repartition(p),
      "label", "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)))).toSet
    assert(run(1) == run(7))
  }
}
