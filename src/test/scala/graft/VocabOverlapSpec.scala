package graft

import graft.textstats.VocabOverlap

class VocabOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("overlapMatrix: hand-computed Jaccard, canonical pair order, " +
    "zero-overlap pairs absent") {
    val docs = Seq(
      ("s1", "alpha beta gamma"),
      ("s1", "alpha delta"),          // s1 vocab: alpha beta gamma delta
      ("s2", "alpha beta zeta"),      // s2 vocab: alpha beta zeta
      ("s3", "omega psi"))            // s3 shares nothing
      .toDF("source", "text")
    val got = VocabOverlap.overlapMatrix(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // s1∩s2 = {alpha, beta} = 2; union = 4+3-2 = 5 -> 4000 bp
    assert(got == Map(("s1", "s2") -> ((4L, 3L, 2L, 5L, 4000L))),
      got.toString)
  }

  test("overlapMatrix: repeated tokens count once (type space, not " +
    "occurrence space)") {
    val docs = Seq(
      ("a", "word word word other"),
      ("b", "word")).toDF("source", "text")
    val got = VocabOverlap.overlapMatrix(docs, "source", "text")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((2L, 1L, 1L)), got.mkString(","))
  }

  test("growthCurve: firsts bucket correctly, every checkpoint reports, " +
    "cumulative is monotone") {
    // ids 0..9, nCheckpoints=10 -> one id per bucket; 'common' first at 0,
    // each doc also introduces a unique LETTER type (digits are cleaned
    // away by the q12 tokenizer, so "u1"-style names would collapse)
    val docs = (0 until 10).map(i => (i.toLong, "common " + ("x" * (i + 1))))
      .toDF("doc_id", "text")
    val got = VocabOverlap.growthCurve(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got(0L) == ((2L, 2L)), got.toString)   // common + u0
    (1 until 10).foreach(k => assert(got(k.toLong) ==
      ((1L, (k + 2).toLong)), s"checkpoint $k: ${got(k.toLong)}"))
  }

  test("growthCurve: saturated vocabulary yields explicit zero rows") {
    val docs = (0 until 10).map(i => (i.toLong, "same words always"))
      .toDF("doc_id", "text")
    val got = VocabOverlap.growthCurve(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.size == 10)
    assert(got(0L) == ((3L, 3L)))
    (1 until 10).foreach(k => assert(got(k.toLong) == ((0L, 3L))))
  }
}
