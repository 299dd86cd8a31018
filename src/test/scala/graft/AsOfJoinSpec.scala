package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each left row matches the latest right row at-or-before it, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100),
      (1L, ts("2024-01-01 11:00:00"), 110),
      (2L, ts("2024-01-01 10:30:00"), 200)
    ).toDF("k", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // between quotes -> 100
      (1L, ts("2024-01-01 11:00:00"), "t2"), // exactly at quote -> 110 (inclusive)
      (1L, ts("2024-01-01 09:00:00"), "t3"), // before any quote -> null
      (2L, ts("2024-01-01 12:00:00"), "t4"), // after key-2 quote -> 200
      (3L, ts("2024-01-01 12:00:00"), "t5")  // key with no quotes -> null
    ).toDF("k", "tts", "trade")

    val out = AsOfJoin.asOfJoin(trades, quotes, "k", "k", "tts", "qts",
        Seq("price"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap

    assert(out == Map("t1" -> Some(100), "t2" -> Some(110), "t3" -> None,
      "t4" -> Some(200), "t5" -> None))
  }

  test("null-key / null-ts left rows emit unmatched (and skip the exchange)") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 100))
      .toDF("k", "qts", "price")
    val trades = Seq(
      (Option(1L), Option(ts("2024-01-01 11:00:00")), "t1"), // matches
      (Option.empty[Long], Option(ts("2024-01-01 11:00:00")), "t2"), // null key
      (Option(1L), Option.empty[Timestamp], "t3") // null ts
    ).toDF("k", "tts", "trade")
    val out = AsOfJoin.asOfJoin(trades, quotes, "k", "k", "tts", "qts",
        Seq("price"))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(3)) None else Some(r.getInt(3)))).toMap
    assert(out == Map("t1" -> Some(100), "t2" -> None, "t3" -> None))
  }

  test("dotted left column names are not parsed as struct paths") {
    import org.apache.spark.sql.functions.col
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 7)).toDF("k", "qts", "v")
    val trades = Seq((1L, ts("2024-01-01 10:30:00"), "x"))
      .toDF("k", "tts", "my.trade")
    val out = AsOfJoin.asOfJoin(trades, quotes, "k", "k", "tts", "qts", Seq("v"))
    assert(out.columns.contains("my.trade"))
    val row = out.select(col("`my.trade`"), col("v")).head()
    assert(row.getString(0) == "x" && row.getInt(1) == 7)
  }

  test("operator-internal column names are rejected up front") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 1)).toDF("k", "qts", "__rv")
    val trades = Seq((1L, ts("2024-01-01 10:30:00"), "x")).toDF("k", "tts", "t")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(trades, quotes, "k", "k", "tts", "qts", Seq("__rv"))
    }
    val trades2 = Seq((1L, ts("2024-01-01 10:30:00"), "x")).toDF("k", "tts", "__l")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfJoin(trades2, quotes.withColumnRenamed("__rv", "v"),
        "k", "k", "tts", "qts", Seq("v"))
    }
  }

  test("plan is a single key-hashed window, not a range join") {
    val quotes = Seq((1L, ts("2024-01-01 10:00:00"), 1)).toDF("k", "qts", "v")
    val trades = Seq((1L, ts("2024-01-01 10:30:00"), "x")).toDF("k", "tts", "t")
    val df = AsOfJoin.asOfJoin(trades, quotes, "k", "k", "tts", "qts", Seq("v"))
    assertNoCartesian(df)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), s"as-of should not plan any join:\n$plan")
  }
}
