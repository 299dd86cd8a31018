package graft

import graft.operators.Integrity

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("fkAudit: orphans counted, null FKs separated, rates exact; " +
    "one row per declared pair in order") {
    val child = Seq(Some(1L), Some(2L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L, 3L, 3L).toDF("pk") // dup pk must not inflate
    val clean = Seq(Some(3L)).toDF("fk")
    val got = Integrity.fkAudit(Seq(
        ("dirty", child, "fk", parent, "pk"),
        ("clean", clean, "fk", parent, "pk")))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got("dirty") == ((4L, 1L, 1L, 2500L)), got.toString)
    assert(got("clean") == ((1L, 0L, 0L, 0L)))
  }

  test("fkAudit rejects an empty pair list") {
    intercept[IllegalArgumentException] { Integrity.fkAudit(Nil) }
  }
}
