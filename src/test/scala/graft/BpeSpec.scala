package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeEncode, GraftExtensions}
import graft.textstats.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val S = BpeEncode.Sep

  test("trainMerges learns the textbook merges on a toy corpus") {
    // 5x "hug", 3x "pug", 2x "hugs": pair counts round 1:
    // (h,u)=7, (u,g)=10, (p,u)=3, (g,s)=2 -> merge (u,g)
    // round 2: (h,ug)=7, (p,ug)=3, (ug,s)=2 -> merge (h,ug)
    // round 3: (p,ug)=3, (hug,s)=2 -> merge (p,ug)
    val docs = Seq("hug hug hug hug hug pug pug pug hugs hugs").toDF("t")
    val merges = Bpe.trainMerges(docs, "t", numMerges = 3)
    assert(merges == Seq(s"u${S}g", s"h${S}ug", s"p${S}ug"))
  }

  test("encode applies merges by rank and reassembly is lossless") {
    val merges = Seq(s"u${S}g", s"h${S}ug", s"p${S}ug")
    val out = Seq(("hug pug hugs mug", 1L)).toDF("t", "id")
      .select(BpeEncode(spark, col("t"), merges).as("toks"))
      .collect().head.getSeq[String](0)
    // hug -> [hug]; pug -> [pug]; hugs -> [hug, s]; mug -> [m, ug]
    assert(out == Seq("hug", "pug", "hug", "s", "m", "ug"))
    assert(out.mkString == "hugpughugsmug") // tokens partition the words
  }

  test("words with no applicable merges fall back to single chars") {
    val out = Seq(("xyz", 1L)).toDF("t", "id")
      .select(BpeEncode(spark, col("t"), Seq(s"a${S}b")).as("toks"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("x", "y", "z"))
  }

  test("empty merge table tokenizes to characters; empty text to nothing") {
    val rows = Seq(("ab cd", 1L), ("", 2L), ("   ", 3L)).toDF("t", "id")
      .select(col("id"), BpeEncode(spark, col("t"), Seq.empty[String]).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1L) == Seq("a", "b", "c", "d"))
    assert(rows(2L) == Seq.empty)
    assert(rows(3L) == Seq.empty)
  }

  test("interpreted eval matches the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val merges = Seq(s"u${S}g", s"h${S}ug")
    val mergesLit = Literal.create(merges, ArrayType(StringType))
    val e = BpeEncode(Literal.create("hug hugs mug", StringType), mergesLit)
    val interpreted = e.eval(null).asInstanceOf[ArrayData]
      .toArray[UTF8String](StringType).map(_.toString).toSeq
    val viaPlan = Seq(("hug hugs mug", 1L)).toDF("t", "id")
      .select(BpeEncode(spark, col("t"), merges).as("toks"))
      .collect().head.getSeq[String](0)
    assert(interpreted == viaPlan)
  }

  test("training is deterministic and partitioning-invariant") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(lower(trim(col("text"))).as("t"))
    val a = Bpe.trainMerges(docs.repartition(1), "t", numMerges = 40)
    val b = Bpe.trainMerges(docs.repartition(13), "t", numMerges = 40)
    assert(a == b && a.size == 40)
  }

  test("learned merges compress: fewer tokens than characters on real docs") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val merges = Bpe.trainMerges(
      docs.select(lower(trim(col("text"))).as("t")), "t", numMerges = 100)
    val stats = docs.select(
        length(regexp_replace(trim(col("text")), "\\s+", "")).as("chars"),
        size(BpeEncode(spark, lower(trim(col("text"))), merges)).as("toks"))
      .agg(sum("chars").as("c"), sum("toks").as("t"))
      .collect().head
    val (c, t) = (stats.getLong(0), stats.getLong(1))
    assert(t < c, s"no compression: $t tokens vs $c chars")
    assert(t.toDouble / c < 0.8, s"weak compression: ${t.toDouble / c}")
  }

  test("astral characters stay intact (code-point symbols, not UTF-16)") {
    val out = Seq(("a\ud83d\ude00b", 1L)).toDF("t", "id")
      .select(BpeEncode(spark, col("t"), Seq.empty[String]).as("toks"))
      .collect().head.getSeq[String](0)
    assert(out == Seq("a", "\ud83d\ude00", "b"))
    assert(out.mkString == "a\ud83d\ude00b") // reassembly survives emoji
  }

  test("bpe_encode is registered as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    Seq(("hug", 1L)).toDF("t", "id").createOrReplaceTempView("bpe_in")
    val out = spark.sql(
      s"SELECT bpe_encode(t, array('u${S}g', 'h${S}ug')) AS toks FROM bpe_in")
      .collect().head.getSeq[String](0)
    assert(out == Seq("hug"))
  }
}
