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

  test("packing plan conserves tokens for arbitrary inputs") {
    import graft.operators.Packing
    val gen = for {
      n <- Gen.choose(1, 120)
      ids <- Gen.listOfN(n, Gen.choose(0L, 10000L)).map(_.distinct)
      toks <- Gen.listOfN(ids.length, Gen.choose(1L, 900L))
    } yield ids.zip(toks)
    val rows = gen.sample.get
    val seqLen = 256
    val got = Packing.planPacking(rows.toDF("id", "n"), "id", "n", seqLen, 4)
      .select("id", "n", "bucket", "bin", "offset")
      .as[(Long, Long, Long, Long, Long)].collect()
    got.groupBy(_._3).foreach { case (_, bucketRows) =>
      // positions are exactly the running sum: start_i+1 = start_i + n_i
      val sorted = bucketRows.sortBy(_._1)
      sorted.foldLeft(0L) { case (expectedStart, (_, n, _, bin, off)) =>
        assert(bin * seqLen + off == expectedStart,
          s"gap/overlap at start $expectedStart: $sorted")
        expectedStart + n
      }
    }
    assert(got.forall(r => r._5 >= 0 && r._5 < seqLen))
  }

  test("stratified sample rate concentrates for arbitrary strata maps") {
    import graft.operators.Sampling
    // fixed seed: this test asserts a STATISTICAL bound (unlike the exact
    // invariants above), so a failure must be replayable
    val rates = Gen.mapOfN(3, Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.choose(0, 10000)))
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(20260812L)).get
    val df = (0L until 4000L).toDF("id")
      .withColumn("s", element_at(array(lit("a"), lit("b"), lit("c")),
        (pmod(col("id"), lit(3)) + 1).cast("int")))
    val kept = Sampling.stratifiedSample(df, "s", rates, defaultBp = 5000,
        bp = Sampling.hashBp(col("id")))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    for (stratum <- Seq("a", "b", "c")) {
      val rate = rates.getOrElse(stratum, 5000)
      val expected = 4000.0 / 3 * rate / 10000.0
      val got = kept.getOrElse(stratum, 0L).toDouble
      // binomial concentration: |got - np| < 5*sqrt(np(1-p)) + slack
      val sd = math.sqrt(expected * (1 - rate / 10000.0))
      assert(math.abs(got - expected) <= 5 * sd + 3,
        s"stratum $stratum rate $rate: got $got expected $expected")
    }
  }
}
