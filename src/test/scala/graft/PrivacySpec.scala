package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("kAnonymitySpectrum: hand-built groups, sizes-of-sizes, at-risk " +
    "flag; NULL QI values form their own group") {
    val df = Seq(
      ("a", Some(1)), ("a", Some(1)), ("a", Some(1)), // group of 3
      ("b", Some(1)), ("b", Some(1)),                 // group of 2
      ("c", Some(2)),                                 // singleton
      ("c", None), ("c", None))                       // NULL group of 2
      .toDF("t", "h")
    val got = Privacy.kAnonymitySpectrum(df, Seq("t", "h"), k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      3L -> ((1L, 3L, 0L)),
      2L -> ((2L, 4L, 1L)),
      1L -> ((1L, 1L, 1L))), got.toString)
  }

  test("pseudonymize: deterministic, referentially consistent, " +
    "injective on this key space, salt-separated, original dropped") {
    val df = (1 to 200).map(i => (i.toLong, i % 7)).toDF("user_id", "x")
    val p = Privacy.pseudonymize(df, "user_id", "prod")
    assert(!p.columns.contains("user_id"))
    // referential integrity: same key -> same pseudonym across frames
    val p2 = Privacy.pseudonymize(df, "user_id", "prod")
    assert(p.select("pseudo").except(p2.select("pseudo")).count() == 0)
    // injective here: 200 keys -> 200 pseudonyms
    assert(p.select("pseudo").distinct().count() == 200)
    // a different salt decorrelates the mapping
    val q = Privacy.pseudonymize(df, "user_id", "test")
    assert(p.select("pseudo").intersect(q.select("pseudo")).count() == 0)
  }

  test("QI monitor rollup: retry duplicates collapse, cross-batch " +
    "partials sum to the batch spectrum") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_qimon").toString
    // batch 0 and batch 1 both touch QI ("a", 1); batch 1's partial is
    // written TWICE (a simulated foreachBatch retry)
    val b0 = Seq(("a", 1, 2L, 0L), ("b", 2, 1L, 0L))
      .toDF("t", "h", "c", "batch_id")
    val b1 = Seq(("a", 1, 3L, 1L))
      .toDF("t", "h", "c", "batch_id")
    b0.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp)
    b1.write.mode("append").parquet(tmp) // retry duplicate
    val got = graft.streaming.ScoringStream.readQiMonitor(
      spark, tmp, Seq("t", "h"), k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // ("a",1): 2+3 = 5 rows; ("b",2): 1 row — sizes {5:1 group, 1:1}
    assert(got == Map(
      5L -> ((1L, 5L, 0L)),
      1L -> ((1L, 1L, 1L))), got.toString)
  }

  test("pseudonym matches a local replay of the polynomial recurrence") {
    val got = Seq(Tuple1(42L)).toDF("k")
      .select(Privacy.pseudonym(col("k"), "s").as("p"))
      .collect().head.getLong(0)
    val want = "s|42".foldLeft(0L)((acc, ch) =>
      (acc * 31 + ch.toLong) % 1000000007L)
    assert(got == want)
  }

  test("deletionAudit: hand counts per frame, null keys kept, subjects " +
    "absent from a frame don't count as present") {
    val frame = Seq(Some(1L), Some(1L), Some(2L), Some(3L), None)
      .toDF("uid")
    val other = Seq(2L, 9L).toDF("uid")
    val subjects = Seq(1L, 2L, 7L).toDF("uid")
    val got = Privacy.deletionAudit(
      Seq(("a", frame, "uid"), ("b", other, "uid")), subjects, "uid")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // a: 5 rows, uid 1 twice + uid 2 removed, null + uid 3 kept;
    //    subjects present = {1, 2} (7 appears nowhere)
    assert(got("a") == ((5L, 3L, 2L, 2L)), got.toString)
    assert(got("b") == ((2L, 1L, 1L, 1L)))
  }

  test("deletionAudit cascades through the pseudonym mapping: auditing " +
    "the pseudonymized frame with mapped subjects finds the same rows") {
    val raw = Seq(10L, 11L, 12L, 10L).toDF("uid")
    val pseudoFrame = Privacy.pseudonymize(raw, "uid", "s")
    val subjects = Seq(10L, 99L).toDF("uid")
    val mapped = subjects
      .select(Privacy.pseudonym(col("uid"), "s").as("pseudo"))
    val got = Privacy.deletionAudit(
      Seq(("p", pseudoFrame, "pseudo")), mapped, "pseudo")
      .collect().head
    // uid 10 appears twice in the raw frame; 99 appears nowhere
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((4L, 2L, 2L, 1L)))
  }

  test("deletionAudit on an EMPTY frame reads zeros, never NULLs (the " +
    "post-deletion sign-off re-run)") {
    val empty = Seq.empty[(Long, String)].toDF("uid", "t")
    val subjects = Seq(10L).toDF("uid")
    val got = Privacy.deletionAudit(
      Seq(("emptied", empty, "uid")), subjects, "uid").collect().head
    assert(!got.anyNull, s"NULLs in the sign-off row: $got")
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((0L, 0L, 0L, 0L)))
  }

  test("pseudonymize survives keyCol named 'pseudo', refuses an unrelated " +
    "pre-existing 'pseudo' column, and rejects '|' in salts") {
    // keyCol == "pseudo": the output must be the PSEUDONYM, not dropped
    val self = Seq((7L, "a")).toDF("pseudo", "t")
    val out = Privacy.pseudonymize(self, "pseudo", "s")
    assert(out.columns.toSet == Set("pseudo", "t"))
    assert(out.select("pseudo").head().getLong(0) !=  7L)
    // unrelated collision: loud, not a silent overwrite
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(Seq((1L, 2L)).toDF("uid", "pseudo"), "uid", "s")
    }
    // delimiter in the salt defeats cross-domain separation: loud
    intercept[IllegalArgumentException] {
      Privacy.pseudonym(col("uid"), "prod|7")
    }
  }
}
