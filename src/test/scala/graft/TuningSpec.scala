package graft

import graft.operators.Tuning

class TuningSpec extends SparkSpec {

  test("advise sizes partitions by bytes, clamped by cores and max") {
    // 100 TB at 128 MiB targets → 819200 partitions, clamped to max
    val big = Tuning.advise(100L << 40, clusterCores = 4000)
    assert(big.initialPartitionNum == 200000)
    // 10 GiB → 80 partitions, but never fewer than the cluster's cores
    val small = Tuning.advise(10L << 30, clusterCores = 256)
    assert(small.initialPartitionNum == 256)
    // mid-size: bytes win
    val mid = Tuning.advise(100L << 30, clusterCores = 64)
    assert(mid.initialPartitionNum == 800)
    // empty input still schedules one task per core
    assert(Tuning.advise(0L, clusterCores = 8).initialPartitionNum == 8)
  }

  test("inputBytes measures real files and ignores missing tables") {
    val b = Tuning.inputBytes(spark, sfDir, Seq("documents", "embeddings"))
    assert(b > 0)
    assert(Tuning.inputBytes(spark, sfDir, Seq("no_such_table")) == 0L)
  }

  test("apply takes effect on a live session (runtime SQLConf only)") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val advice = Tuning.advise(1L << 30, clusterCores = 16,
        targetPartitionBytes = 64L << 20)
      Tuning.apply(spark, advice)
      assert(spark.conf.get("spark.sql.shuffle.partitions") ==
        advice.initialPartitionNum.toString)
      assert(spark.conf.get("spark.sql.files.maxPartitionBytes") ==
        (64L << 20).toString)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  test("skewReport: hand-built skew — shares, salt factors and ranks " +
    "are exact; null keys excluded") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // key a: 8 rows, b: 2, c: 2, d: 2, plus 2 null-key rows
    val rows = Seq.fill(8)("a") ++ Seq("b", "b", "c", "c", "d", "d")
    val df = (rows.map(Option(_)) ++ Seq(None, None)).toDF("k")
    val got = graft.operators.Tuning.skewReport(df, "k", topK = 2)
      .collect().map(r => (r.getAs[String]("key"), r.getAs[Long]("n"),
        r.getAs[Long]("share_bp"), r.getAs[Long]("salt_factor"),
        r.getAs[Int]("rank"))).toList.sortBy(_._5)
    // counts: a=8, b=c=d=2 -> median key weight 2, total 14 (nulls out)
    assert(got == List(
      ("a", 8L, 10000L * 8 / 14, 4L, 1),
      ("b", 2L, 10000L * 2 / 14, 1L, 2)), got.toString)
  }
}
