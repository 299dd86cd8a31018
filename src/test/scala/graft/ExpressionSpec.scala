package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, MinHashSignature}

class ExpressionSpec extends SparkSpec {
  import spark.implicits._

  private val arrays = Seq(
    (1L, Seq(3L, 17L, -4L, 99L)),
    (2L, Seq(Long.MaxValue, Long.MinValue, 0L)),
    (3L, Seq(42L)))

  test("minhash_sig matches a local XXH64 computation (codegen + interpreted)") {
    val df = arrays.toDF("id", "sh")
      .select(col("id"), MinHashSignature(spark, col("sh"), 8).as("sig"))
    val got = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    arrays.foreach { case (id, sh) =>
      val expect = (0 until 8).map(j => sh.map(s => XXH64.hashLong(s, j.toLong)).min)
      assert(got(id) == expect, s"id=$id")
    }
  }

  test("minhash_sig is registered as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    arrays.toDF("id", "sh").createOrReplaceTempView("shingle_sets")
    val viaSql = spark.sql(
      "SELECT id, minhash_sig(sh, 8) AS sig FROM shingle_sets")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaColumn = arrays.toDF("id", "sh")
      .select(col("id"), MinHashSignature(spark, col("sh"), 8).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaSql == viaColumn)
  }

  test("minhash_sig survives inside the full banded pipeline") {
    import graft.dedup.MinHashDedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "unrelated words entirely different from those")).toDF("id", "text")
    val pairs = MinHashDedup.nearDuplicates(docs, "id", "text", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }
}
