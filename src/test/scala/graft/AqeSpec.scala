package graft

import org.apache.spark.sql.functions._

/** Runtime-adaptive execution guards: GraftSession turns AQE + skew-join
  * splitting on (GraftSession.scala:25-27); this spec proves the skew path
  * actually engages — the automatic complement to the manual salted join
  * (Relational.saltedJoin) for skew the planner can't see coming. */
class AqeSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime (no manual salting)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // shrink the skew thresholds so test-sized data exhibits the 100 TB
      // shape: one hot key orders of magnitude above the median partition
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2048")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1024")
      val fact = spark.range(50000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(5000)
          .select((col("id") % 100).as("k"), col("id").as("v")))
      val dim = spark.range(100)
        .select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      // collect(), not count(): count() builds a separate QueryExecution,
      // leaving THIS dataset's adaptive plan unfinalized (isFinalPlan=false)
      assert(joined.collect().length == 50000 + 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("AdaptiveSparkPlan"), s"AQE not active:\n$plan")
      assert(plan.toLowerCase.contains("skew"),
        s"skew-join split did not engage:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
