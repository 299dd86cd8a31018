package graft

import org.apache.spark.sql.functions._

import graft.dedup.{NGramJaccard, Stitch}

class StitchSpec extends SparkSpec {
  import spark.implicits._

  private def tok(i: Int) = s"t${('a' + i / 26).toChar}${('a' + i % 26).toChar}"

  test("token-aligned fragments stitch tail→head with a perfect score, " +
    "and the pair is invisible to whole-set Jaccard") {
    // fragment A: tokens 1..40; fragment B: tokens 31..70 (10-token strip)
    val a = (1 to 40).map(tok).mkString(" ")
    val b = (31 to 70).map(tok).mkString(" ")
    val other = (200 to 260).map(tok).mkString(" ")
    val docs = Seq((1L, a), (2L, b), (3L, other)).toDF("id", "text")
    val got = Stitch.stitchPairs(docs, "id", "text", n = 3, h = 8,
        minBp = 5000)
      .as[(Long, Long, Long)].collect()
    // A's last 8 trigrams live in tokens 31..40, all inside B's head
    assert(got.toSeq == Seq((1L, 2L, 10000L)), got.mkString(","))
    // symmetric Jaccard of the pair is ~10/70 — far below any threshold
    assert(NGramJaccard.similarPairs(docs, "id", "text",
      n = 3, threshold = 0.5).isEmpty)
  }

  test("direction is preserved: the reversed pair does not appear") {
    val a = (1 to 40).map(tok).mkString(" ")
    val b = (31 to 70).map(tok).mkString(" ")
    val got = Stitch.stitchPairs(Seq((1L, a), (2L, b)).toDF("id", "text"),
        "id", "text", 3, 8, 5000)
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
  }

  test("partial boundary overlap scores the exact bp fraction") {
    // B starts 4 trigrams before A's end: tail∩head = 4 of 8 → 5000 bp
    val a = (1 to 40).map(tok).mkString(" ")
    val b = ((35 to 70) map tok).mkString(" ")
    // A's tail trigrams start at tokens 31..38; B's head at 35..44:
    // shared trigram starts 35..38 → 4
    val got = Stitch.stitchPairs(Seq((1L, a), (2L, b)).toDF("id", "text"),
        "id", "text", 3, 8, 5000)
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 5000L)), got.mkString(","))
  }

  test("below-threshold overlap and unrelated docs emit nothing; no self") {
    val a = (1 to 40).map(tok).mkString(" ")
    val c = (38 to 70).map(tok).mkString(" ") // only 1 shared tail trigram
    val got = Stitch.stitchPairs(Seq((1L, a), (2L, c)).toDF("id", "text"),
      "id", "text", 3, 8, 5000)
    assert(got.isEmpty)
  }

  test("assemblyPlan: mutual-best edges form chains with component ids " +
    "and walk positions; fan-in loses to the stronger predecessor") {
    val pairs = Seq(
      (1L, 2L, 10000L),  // chain 1→2→3
      (2L, 3L, 10000L),
      (9L, 2L, 7500L),   // weaker predecessor of 2: loses to 1→2
      (7L, 8L, 8750L))   // separate chain 7→8
      .toDF("id_a", "id_b", "overlap_bp")
    val got = Stitch.assemblyPlan(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L),
      (7L, 7L, 0L), (8L, 7L, 1L)))
  }

  test("assemblyPlan: a 2-cycle has no head and emits nothing") {
    val pairs = Seq((1L, 2L, 10000L), (2L, 1L, 10000L))
      .toDF("id_a", "id_b", "overlap_bp")
    assert(Stitch.assemblyPlan(pairs).isEmpty)
  }

  test("assemblyPlan: a 20-fragment chain walks to its full depth — " +
    "the drain loop has no truncation cap") {
    val pairs = (1L to 19L).map(i => (i, i + 1, 10000L))
      .toDF("id_a", "id_b", "overlap_bp")
    val got = Stitch.assemblyPlan(pairs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == (1L to 20L).map(i => (i, 1L, i - 1)).toSet)
  }

  test("plan: posting equi-joins only, never all-pairs") {
    val docs = (1L to 30L).map(i =>
      (i, (i.toInt to i.toInt + 30).map(tok).mkString(" "))).toDF("id", "text")
    assertNoCartesian(Stitch.stitchPairs(docs, "id", "text", 3, 8, 5000))
  }
}
