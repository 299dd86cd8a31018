package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.functions.TextFunctions
import graft.textstats.TextStats

/** Property-based invariants over the text operators, exercised through
  * Spark itself (batched: one DataFrame per property, 200 generated rows —
  * scalacheck supplies the generators; assertions run over the collected
  * results rather than per-sample forAll, so Spark jobs stay coarse). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '\t', '\n', '.', ',', '!', '-', '\''))).map(_.mkString)

  private def run(samples: Seq[String])(sel: org.apache.spark.sql.Column*) =
    samples.toDF("text").select(sel: _*).collect()

  test("cleanText is idempotent") {
    val samples = Gen.listOfN(200, asciiText).sample.get
    val rows = run(samples)(
      TextFunctions.cleanText(col("text")).as("once"),
      TextFunctions.cleanText(TextFunctions.cleanText(col("text"))).as("twice"))
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  test("cleanText output never contains punctuation, digits, or doubled spaces") {
    val samples = Gen.listOfN(200, asciiText).sample.get
    val rows = run(samples)(TextFunctions.cleanText(col("text")).as("c"))
    val bad = TextFunctions.punctDigitsClass.r
    rows.foreach { r =>
      val c = r.getString(0)
      assert(bad.findFirstIn(c).isEmpty, s"punct/digit survived: '$c'")
      assert(!c.contains("  "), s"doubled space survived: '$c'")
      assert(c == c.trim, s"untrimmed: '$c'")
    }
  }

  test("wordCount is positive and bounded by text length") {
    val samples = Gen.listOfN(200, asciiText).sample.get
    val rows = run(samples)(col("text"),
      TextFunctions.wordCount(col("text")).as("wc"))
    rows.foreach { r =>
      val wc = r.getInt(1)
      assert(wc >= 1)
      assert(wc <= r.getString(0).length + 1, r.toString)
    }
  }

  test("fingerprint stays within the modulus and is length-sensitive") {
    val samples = Gen.listOfN(200, asciiText).sample.get
    val rows = run(samples)(TextStats.fingerprint(col("text")).as("fp"))
    rows.foreach { r =>
      val fp = r.getLong(0)
      assert(fp >= 0 && fp < 1000000007L, fp.toString)
    }
  }

  test("qualityScore stays in [0, 10000] basis points") {
    val samples = Gen.listOfN(200, asciiText).sample.get
    val rows = run(samples)(TextStats.qualityScore(col("text")).as("q"))
    rows.foreach { r =>
      val q = r.getLong(0)
      assert(q >= 0 && q <= 10000, q.toString)
    }
  }
}
