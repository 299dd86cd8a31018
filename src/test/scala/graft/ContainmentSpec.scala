package graft

import org.apache.spark.sql.functions._

import graft.dedup.{Containment, NGramJaccard}

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  // cleanText strips digits, so tokens must be alphabetic-only
  private def tok(i: Int) = s"t${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
  private val article = (1 to 60).map(tok).mkString(" ")
  private val excerpt = (10 to 21).map(tok).mkString(" ")

  test("a planted excerpt is found with high containment while the same " +
    "pair is invisible to symmetric Jaccard at the same threshold") {
    val docs = Seq((1L, article), (2L, excerpt),
      (3L, (100 to 160).map(tok).mkString(" ")))
      .toDF("id", "text")
    val got = Containment.containedPairs(docs, "id", "text",
        n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set((2L, 1L)))
    // excerpt grams: 10 of 10 inside the article
    assert(got.head._3 == 1.0)
    assert(NGramJaccard.similarPairs(docs, "id", "text",
      n = 3, threshold = 0.8).isEmpty)
  }

  test("exact duplicates emit exactly one row, oriented by id, c = 1.0") {
    val docs = Seq((7L, article), (4L, article)).toDF("id", "text")
    val got = Containment.containedPairs(docs, "id", "text",
        n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq((4L, 7L, 1.0)))
  }

  test("unrelated documents never pair; no self pairs") {
    val docs = Seq((1L, article),
      (2L, (200 to 260).map(tok).mkString(" "))).toDF("id", "text")
    assert(Containment.containedPairs(docs, "id", "text",
      n = 3, threshold = 0.5).isEmpty)
  }

  test("orientation: the smaller distinct-gram set is always id_in") {
    val docs = Seq((9L, excerpt), (2L, article)).toDF("id", "text")
    val got = Containment.containedPairs(docs, "id", "text",
        n = 3, threshold = 0.8)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set((9L, 2L)))
  }

  test("partial overlap below threshold is dropped, above kept, exact value") {
    // contained side has 8 grams; 6 shared with the container
    val small = ((1 to 8) ++ (300 to 303)).map(tok).mkString(" ")
    val big = ((1 to 10) ++ (400 to 440)).map(tok).mkString(" ")
    val docs = Seq((1L, big), (2L, small)).toDF("id", "text")
    // small: 10 distinct 3-grams, big misses those touching w100..w103
    val at = Containment.containedPairs(docs, "id", "text", 3, 0.5)
      .as[(Long, Long, Double)].collect()
    assert(at.length == 1 && at.head._1 == 2L)
    assert(at.head._3 == 0.6, at.head.toString) // 6 of 10 grams shared
    assert(Containment.containedPairs(docs, "id", "text", 3, 0.7).isEmpty)
  }

  test("scrubContained drops exactly the contained docs with evidence; " +
    "a containment chain keeps only the maximal container") {
    // chain: tiny ⊂ mid ⊂ big — one-pass rule drops tiny AND mid
    val tiny = (20 to 31).map(tok).mkString(" ")
    val mid = (15 to 40).map(tok).mkString(" ")
    val big = (1 to 60).map(tok).mkString(" ")
    val docs = Seq((1L, big), (2L, mid), (3L, tiny),
      (4L, (200 to 260).map(tok).mkString(" "))).toDF("id", "text")
    val got = Containment.scrubContained(docs, "id", "text", 3, 0.8)
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1L, None)) && got(4L) == ((1L, None)))
    assert(got(2L) == ((0L, Some(1L))) && got(3L) == ((0L, Some(1L))))
  }

  test("minInGrams floor: pairs identical to the unfloored run for " +
    "qualifying docs; sub-floor contained docs drop; lemma boundary holds") {
    // 20 articles with overlapping vocab + one excerpt (10 grams) per 4th
    // article + one TINY excerpt (3 grams) of article 0
    val arts = (0L until 20L).map(i =>
      (i, (i.toInt * 7 until i.toInt * 7 + 50).map(tok).mkString(" ")))
    val exs = (0L until 20L by 4).map(i =>
      (100L + i, (i.toInt * 7 + 5 until i.toInt * 7 + 17).map(tok).mkString(" ")))
    val tiny = Seq((999L, (3 to 7).map(tok).mkString(" "))) // 5 toks → 3 grams
    val docs = (arts ++ exs ++ tiny).toDF("id", "text")
    val base = Containment.containedPairs(docs, "id", "text",
      n = 3, threshold = 0.8).as[(Long, Long, Double)].collect().toSet
    val floored = Containment.containedPairs(docs, "id", "text",
      n = 3, threshold = 0.8, minInGrams = 8)
      .as[(Long, Long, Double)].collect().toSet
    val szs = NGramJaccard.shingleSets(docs, "id", "text", 3)
      .select(col("id"), size(col("sh")).as("n"))
      .as[(Long, Int)].collect().toMap
    // losslessness on the floored domain: exactly the base pairs whose
    // contained side has ≥ 8 grams — the container-prefix truncation
    // loses nothing (the class-doc lemma)
    assert(floored == base.filter(p => szs(p._1) >= 8), s"base=$base floored=$floored")
    // the floor is doing something: the tiny excerpt pairs in base only
    assert(base.exists(_._1 == 999L), "tiny excerpt must pair unfloored")
    assert(!floored.exists(_._1 == 999L), "tiny excerpt must be floored out")
    // and the planted ≥-floor excerpts all survive the truncated index
    assert((0L until 20L by 4).forall(i => floored.exists(_._1 == 100L + i)),
      s"qualifying excerpt lost by the truncated container index: $floored")
  }

  test("incremental screen: planted excerpt of an indexed doc is flagged, " +
    "a new superset of an indexed doc is NOT (roles fixed), tiny docs " +
    "floor out; batch index never re-probed all-pairs") {
    val hist = Seq((1L, article),
      (2L, (100 to 160).map(tok).mkString(" "))).toDF("id", "text")
    val sets = Containment.containerSets(hist, "id", "text", 3)
    val postings = Containment.containerPostings(sets, 0.8, minInGrams = 8)
    val newDocs = Seq(
      (10L, excerpt),                                  // excerpt of doc 1
      (11L, (300 to 340).map(tok).mkString(" ")),      // unrelated
      (12L, article + " " + (400 to 430).map(tok).mkString(" ")), // superset
      (13L, (12 to 17).map(tok).mkString(" ")))        // 6 toks → sub-floor
      .toDF("id", "text")
    val got = Containment.containedAgainstIndex(newDocs, "id", "text",
      postings, sets, n = 3, threshold = 0.8, minInGrams = 8)
    val flagged = got.as[(Long, Long, Double)].collect()
    assert(flagged.map(r => (r._1, r._2)).toSet == Set((10L, 1L)),
      s"got ${flagged.mkString(",")}")
    assert(flagged.head._3 == 1.0)
    assertNoCartesian(got)
  }

  test("incremental screen at minInGrams = 1 finds sub-floor excerpts too " +
    "(the exact default)") {
    val hist = Seq((1L, article)).toDF("id", "text")
    val sets = Containment.containerSets(hist, "id", "text", 3)
    val postings = Containment.containerPostings(sets, 0.8, minInGrams = 1)
    val tiny = Seq((13L, (12 to 17).map(tok).mkString(" "))).toDF("id", "text")
    val got = Containment.containedAgainstIndex(tiny, "id", "text",
      postings, sets, n = 3, threshold = 0.8, minInGrams = 1)
      .as[(Long, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set((13L, 1L)), got.mkString(","))
  }

  test("plan: posting equi-joins only, never all-pairs") {
    val docs = Seq((1L, article), (2L, excerpt)).toDF("id", "text")
    assertNoCartesian(
      Containment.containedPairs(docs, "id", "text", 3, 0.8))
  }
}
