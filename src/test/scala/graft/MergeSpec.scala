package graft

import org.apache.spark.sql.functions._

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "en", 100L), (2L, "de", 200L), (3L, "fr", 300L))
    .toDF("id", "lang", "n")

  private def apply(changes: (Long, String, String, Long)*) =
    Merge.applyChanges(base,
      changes.toDF("id", "op", "lang", "n"), "id")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("delete removes, update replaces, insert adds; untouched rows " +
    "pass through") {
    val got = apply(
      (2L, "delete", null, 0L),
      (3L, "update", "it", 999L),
      (9L, "insert", "xx", 7L))
    assert(got == Map(
      1L -> (("en", 100L)),
      3L -> (("it", 999L)),
      9L -> (("xx", 7L))), got.toString)
  }

  test("upsert semantics: insert on a matched id replaces, update on an " +
    "unmatched id adds; unmatched delete is a no-op") {
    val got = apply(
      (1L, "insert", "pt", 1L),
      (8L, "update", "nl", 8L),
      (77L, "delete", null, 0L))
    assert(got(1L) == (("pt", 1L)))
    assert(got(8L) == (("nl", 8L)))
    assert(got.size == 4, got.toString) // 1 replaced, 2+3 kept, 8 added
  }

  test("unknown ops raise loudly instead of silently dropping a change") {
    val err = intercept[Exception] {
      Merge.applyChanges(base,
        Seq((1L, "upsort", "en", 1L)).toDF("id", "op", "lang", "n"),
        "id").collect()
    }
    assert(err.getMessage.contains("unknown merge op"),
      err.getMessage.take(200))
  }

  test("plan: one equi-join, never all-pairs") {
    assertNoCartesian(Merge.applyChanges(base,
      Seq((1L, "update", "en", 5L)).toDF("id", "op", "lang", "n"), "id"))
  }

  test("a NULL op on a present change row raises — matched it must not " +
    "silently no-op, unmatched it must not insert a ghost row") {
    def nullOp(id: Long) =
      Seq((id, Option.empty[String], "xx", 7L)).toDF("id", "op", "lang", "n")
    val matched = intercept[Exception] {
      Merge.applyChanges(base, nullOp(1L), "id").collect()
    }
    assert(matched.getMessage.contains("unknown merge op"),
      matched.getMessage.take(200))
    val unmatched = intercept[Exception] {
      Merge.applyChanges(base, nullOp(42L), "id").collect()
    }
    assert(unmatched.getMessage.contains("unknown merge op"),
      unmatched.getMessage.take(200))
  }
}
