package graft

/** Dev utility: write the `explain("formatted")` plan of queries to
  * files — the plans/rNN before/after evidence. Usage:
  *   PlanDump <outDir> <suffix> <name[,name…]> [sfDir]
  * Writes <outDir>/<name>_<suffix>.txt for each query. The dump is taken
  * before the query's final action, and AQE shows the initial plan —
  * but query CONSTRUCTION is not free of execution: eager
  * Guards.materialize sites run their shared subtrees while the query
  * is being built, so a dumped plan shows those subtrees collapsed to
  * `Scan ExistingRDD` (their exchanges ran once, during construction,
  * and are not visible here). Compare Exchange counts with that caveat;
  * ProfOne's job/task-time numbers are the execution-complete metric.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $name ($suffix)")
    }
    spark.stop()
  }
}
