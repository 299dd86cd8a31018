package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run one SparkEntry query by name, print timing and
  * optionally the formatted plan. Usage:
  *   RunOne <queryName> <sfDir> [explain]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Clock starts BEFORE construction: some queries do real work eagerly
    // (q19's auto-sizing count, q43/q44's CC fixpoint) and must be billed.
    val tc = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sfDir)
    val tp = System.nanoTime()
    df.queryExecution.executedPlan // force analysis + physical planning
    val t0 = System.nanoTime()
    val n = df.count()
    val tEnd = System.nanoTime()
    if (args.contains("explain")) df.explain("formatted")
    args.find(_.startsWith("dump=")).foreach { d =>
      df.write.mode("overwrite").parquet(d.stripPrefix("dump="))
    }
    println(f"[runone] $name rows=$n construct=${(tp - tc) / 1e9}%.2f s " +
      f"plan=${(t0 - tp) / 1e9}%.2f s exec=${(tEnd - t0) / 1e9}%.2f s " +
      f"total=${(tEnd - tc) / 1e9}%.2f s")
    spark.stop()
  }
}
