package graft

import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(java.lang.Long, Long, Long, java.lang.Long)]) =
    Scd.buildScd2(rows.toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a"))
      .collect()
      .map(r => (Option(r.get(0)).map(_.asInstanceOf[Long]),
        Option(r.get(1)).map(_.asInstanceOf[Long]),
        r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        r.getInt(4))).toSet

  private def L(x: Long): java.lang.Long = java.lang.Long.valueOf(x)

  test("no-op updates collapse; eff ranges chain; current version open") {
    // key 1: a=5 @10, a=5 @20 (no-op), a=7 @30, a=5 @40 (back — a change)
    val got = run(Seq(
      (L(1), 10L, 1L, L(5)), (L(1), 20L, 2L, L(5)),
      (L(1), 30L, 3L, L(7)), (L(1), 40L, 4L, L(5))))
    assert(got == Set(
      (Some(1L), Some(5L), 10L, Some(30L), 1),
      (Some(1L), Some(7L), 30L, Some(40L), 2),
      (Some(1L), Some(5L), 40L, None, 3)), got.toString)
  }

  test("NULL attribute is a state, not a change: null runs collapse and " +
    "null↔value transitions version") {
    val got = run(Seq(
      (L(2), 10L, 1L, null), (L(2), 20L, 2L, null),
      (L(2), 30L, 3L, L(1)), (L(2), 40L, 4L, null)))
    assert(got == Set(
      (Some(2L), None, 10L, Some(30L), 1),
      (Some(2L), Some(1L), 30L, Some(40L), 2),
      (Some(2L), None, 40L, None, 3)), got.toString)
  }

  test("same-instant ties order by the tie column; null keys excluded") {
    val got = run(Seq(
      (L(3), 10L, 2L, L(9)), (L(3), 10L, 1L, L(8)),
      (null, 10L, 3L, L(7))))
    // tie 1 (a=8) precedes tie 2 (a=9) at the same ts
    assert(got == Set(
      (Some(3L), Some(8L), 10L, Some(10L), 1),
      (Some(3L), Some(9L), 10L, None, 2)), got.toString)
  }

  test("keys are independent and the build is partitioning-invariant") {
    val rows = (1 to 120).map { i =>
      (L(i % 6), i.toLong, i.toLong, L((i / 17) % 3))
    }
    val a = Scd.buildScd2(rows.toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a")).collect().map(_.toSeq).toSet
    val b = Scd.buildScd2(rows.toDF("k", "ts", "tie", "a").repartition(7),
      "k", "ts", "tie", Seq("a")).collect().map(_.toSeq).toSet
    assert(a == b)
    // exactly one open version per key
    val open = a.toSeq.count(r => r(3) == null)
    assert(open == 6, s"expected 6 open versions, got $open")
  }

  test("applyIncrement == full rebuild: touched keys re-version, " +
    "untouched pass through, the open chain re-closes, and a no-op " +
    "increment row is dropped") {
    import graft.operators.Scd
    // history: key 1 states 5→7; key 2 state 3 (untouched by increment)
    val hist = Seq((L(1), 10L, 1L, L(5)), (L(1), 20L, 2L, L(7)),
      (L(2), 10L, 3L, L(3)))
    // increment: key 1 gets a NO-OP (7 again — must drop) then 9;
    // key 3 is brand new
    val inc = Seq((L(1), 30L, 4L, L(7)), (L(1), 40L, 5L, L(9)),
      (L(3), 35L, 6L, L(1)))
    val dim = Scd.buildScd2(hist.toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a"))
    val got = Scd.applyIncrement(dim, inc.toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a"))
      .collect().map(_.toSeq).toSet
    val want = Scd.buildScd2((hist ++ inc).toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a"))
      .collect().map(_.toSeq).toSet
    assert(got == want, s"got=$got\nwant=$want")
    // the no-op dropped: key 1 has versions 5, 7, 9 — three, not four
    assert(got.count(r => r.head == 1L) == 3)
    // untouched key 2 still open
    assert(got.exists(r => r.head == 2L && r(3) == null))
  }

  test("applyIncrement == full rebuild on a generated many-key log " +
    "split at its midpoint") {
    import graft.operators.Scd
    val all = (1 to 400).map { i =>
      (L(i % 7), i.toLong * 10, i.toLong, L((i / 13) % 4))
    }
    val (hist, inc) = all.partition(_._2 < 2000L)
    val dim = Scd.buildScd2(hist.toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a"))
    val got = Scd.applyIncrement(dim, inc.toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a")).collect().map(_.toSeq).toSet
    val want = Scd.buildScd2(all.toDF("k", "ts", "tie", "a"),
      "k", "ts", "tie", Seq("a")).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("multi-attribute state: a change in ANY attribute versions") {
    val df = Seq((1L, 10L, 1L, 5L, "x"), (1L, 20L, 2L, 5L, "y"),
      (1L, 30L, 3L, 5L, "y")).toDF("k", "ts", "tie", "a", "b")
    // columns: k(0), a(1), b(2), eff_start_us(3), eff_end_us(4), version(5)
    val got = Scd.buildScd2(df, "k", "ts", "tie", Seq("a", "b"))
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3),
        r.getInt(5))).toSet
    assert(got == Set((5L, "x", 10L, 1), (5L, "y", 20L, 2)), got.toString)
  }
}
