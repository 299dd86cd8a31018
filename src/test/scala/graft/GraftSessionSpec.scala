package graft

class GraftSessionSpec extends SparkSpec {

  test("getOrCreate registers graft SQL functions on an existing session") {
    spark // materialize the shared test session first
    val s = GraftSession.getOrCreate()
    import s.implicits._
    val out = Seq((1L, Seq(7L, 8L))).toDF("id", "sh")
    out.createOrReplaceTempView("gs_probe")
    val sig = s.sql("SELECT minhash_sig(sh, 4) AS sig FROM gs_probe")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
  }

  test("builder produces a session with the expected posture") {
    spark // materialize the shared test session first
    val s = GraftSession.getOrCreate()
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
    assert(s.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(s.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true")
  }
}
