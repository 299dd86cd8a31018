package graft

import org.apache.spark.sql.functions._

import graft.dedup.Decontaminate
import graft.functions.{BloomContains, BloomFilterSet}
import graft.sources.Tables

class BloomFilterSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val inserted = Array.fill(5000)(rnd.nextLong())
  private val absent = Array.fill(20000)(rnd.nextLong())
    .filterNot(inserted.toSet)

  test("no false negatives: every inserted hash probes true") {
    val (bits, k) = BloomFilterSet.build(inserted, bitsPerItem = 16)
    assert(inserted.forall(BloomFilterSet.mightContain(bits, _, k)))
  }

  test("false-positive rate near theory at 16 bits/item (~0.05%)") {
    val (bits, k) = BloomFilterSet.build(inserted, bitsPerItem = 16)
    val fp = absent.count(BloomFilterSet.mightContain(bits, _, k))
    // theory ~0.05%; allow an order of magnitude of slack (~10 of 20000)
    assert(fp <= 20, s"fp rate too high: $fp / ${absent.length}")
  }

  test("codegen probe agrees with the interpreted twin on every hash") {
    val (bits, k) = BloomFilterSet.build(inserted, bitsPerItem = 16)
    val hashes = (inserted.take(500) ++ absent.take(2000)).toSeq
    val viaExpr = hashes.toDF("h")
      .select(col("h"), BloomContains(spark, col("h"), bits, k).as("hit"))
      .as[(Long, Boolean)].collect().toMap
    hashes.foreach { h =>
      assert(viaExpr(h) == BloomFilterSet.mightContain(bits, h, k),
        s"codegen/interpreted disagree on $h")
    }
  }

  test("degenerate sizes: k=1, one-word bitset still correct") {
    val hs = Array(1L, -7L, Long.MaxValue, Long.MinValue, 0L)
    val (bits, k) = BloomFilterSet.build(hs, bitsPerItem = 1)
    assert(bits.length == 1 && k == 1)
    assert(hs.forall(BloomFilterSet.mightContain(bits, _, k)))
  }

  test("contaminationHitsBloom emits exactly contaminationHits' rows") {
    val docs = Tables.documents(spark, sfDir)
    val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
    val slow = Decontaminate.contaminationHits(docs, bench, "doc_id", "text",
      n = 8).as[(Long, Long)].collect().toSet
    val fast = Decontaminate.contaminationHitsBloom(docs, bench, "doc_id",
      "text", n = 8).as[(Long, Long)].collect().toSet
    assert(slow.nonEmpty, "fixture produced no contamination hits")
    assert(fast == slow)
  }

  test("maxGrams fail-fast rejects a non-eval-suite benchmark side") {
    val docs = Tables.documents(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      Decontaminate.contaminationHitsBloom(docs, docs, "doc_id", "text",
        n = 8, maxGrams = 10)
    }
    assert(e.getMessage.contains("distinct grams"))
  }

  test("bloom probe stays inside whole-stage codegen") {
    val (bits, k) = BloomFilterSet.build(inserted.take(64), bitsPerItem = 16)
    // spark.range, not a LocalRelation — ConvertToLocalRelation would fold
    // the probe at optimization time and leave no codegen span to assert on
    val df = spark.range(100).select(col("id").as("h"))
      .filter(BloomContains(spark, col("h"), bits, k))
    // `*(n)` prefixes mark operators inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Filter") || plan.contains("WholeStageCodegen"),
      s"probe not inside a codegen span:\n$plan")
    df.count() // force execution through the codegen path
  }
}
