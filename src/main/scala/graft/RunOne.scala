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
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.contains("explain")) df.explain("formatted")
    args.find(_.startsWith("dump=")).foreach { d =>
      df.write.mode("overwrite").parquet(d.stripPrefix("dump="))
    }
    val tp = System.nanoTime()
    df.queryExecution.executedPlan // force analysis + physical planning
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"[runone] $name rows=$n plan=${(t0 - tp) / 1e9}%.2f s " +
      f"exec=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
