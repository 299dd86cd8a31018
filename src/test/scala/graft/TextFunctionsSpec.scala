package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("cleanText strips punctuation/digits, squeezes whitespace, trims") {
    val df = Seq(
      "Hello, World! 123",
      "  a\t\nb  ",
      "!!!",
      "",
      "no-change words here"
    ).toDF("text").select(TextFunctions.cleanText(col("text")).as("c"))
    assert(df.as[String].collect().toSeq ==
      Seq("Hello World", "a b", "", "", "no change words here"))
  }

  test("binarize is a when() threshold") {
    val df = Seq(1.0, 99.9, 100.0, 250.0).toDF("v")
      .select(TextFunctions.binarize(col("v"), 100).as("b"))
    assert(df.as[Int].collect().toSeq == Seq(0, 0, 1, 1))
  }

  test("tokens lower-cases and splits cleaned text") {
    val df = Seq("The QUICK, brown fox!").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
    assert(df.as[Seq[String]].head() == Seq("the", "quick", "brown", "fox"))
  }

  test("wordCount == size(tokens)") {
    val df = Seq(("a b c", 3), ("one-word", 2), ("", 1)).toDF("text", "expect")
    val got = df.select(TextFunctions.wordCount(col("text")).as("wc"),
      col("expect")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }
}
