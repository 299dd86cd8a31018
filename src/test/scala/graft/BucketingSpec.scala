package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without any shuffle exchange") {
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    // clear any table/location left by a previous run
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Tables.writeBucketed(o.withColumnRenamed("o_orderkey", "k"), "orders_b", "k", 8)
    Tables.writeBucketed(l.withColumnRenamed("l_orderkey", "k"), "lineitem_b", "k", 8)
    // force the sort-merge path (broadcast would mask the co-location win
    // that matters when BOTH sides are fact-sized)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b").join(spark.table("lineitem_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and the result matches the plain (shuffling) join
      val expect = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
      assert(joined.count() == expect)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin equals the plain join and spreads the shuffle key") {
    val fact = Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey")
    val dim = Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_mktsegment"))
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, Seq("o_custkey")).count()
    val salted = Relational.saltedJoin(fact, dim, "o_custkey", saltFactor = 4)
    assert(salted.count() == plain)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt") || plan.contains("hashpartitioning"),
      s"salt did not enter the plan:\n$plan")
  }
}
