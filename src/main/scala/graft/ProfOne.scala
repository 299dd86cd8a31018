package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev measurement harness (guide §1): run queries under the bench's own
  * noop-sink convention while a SparkListener counts jobs, stages and
  * tasks and sums task time — separating scheduler/plan fixed costs from
  * actual compute. Usage:
  *   ProfOne <name[,name…]|prefix> <sfDir> [runs=N]
  * Prints per run: wall seconds, job count, stage count, task count,
  * summed task seconds. Per-query JVM/codegen warmup is visible as the
  * run-1 vs run-2 delta (the bench's median-of-3 convention hides it).
  */
object ProfOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    // option-like args (runs=N, stages, jobs) must not be mistaken for the
    // positional sfDir: "ProfOne q16 runs=5" used to set sfDir to "runs=5"
    // and fail every query on a nonexistent data dir
    def isOption(a: String): Boolean =
      a.startsWith("runs=") || a == "stages" || a == "jobs"
    val sfDir = args.drop(1).find(!isOption(_))
      .getOrElse("/root/testdata/sf0.1")
    val runs = args.find(_.startsWith("runs="))
      .map(_.stripPrefix("runs=").toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(Some(s"local[$cpus]"), Some(cpus.toInt))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    val jobStart = scala.collection.mutable.Map[Int, Long]()
    val jobSpans =
      scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]() // id, t0, t1
    val stageNames = scala.collection.mutable.Map[Int, String]()
    val stageAgg =
      scala.collection.mutable.Map[Int, (Int, Long)]() // id -> (tasks, ms)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        synchronized { jobs += 1; jobStart(e.jobId) = e.time }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        synchronized {
          jobStart.remove(e.jobId).foreach(t0 =>
            jobSpans += ((e.jobId, t0, e.time)))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        synchronized {
          stages += 1
          // RDD scope names identify the SQL operators the stage executes
          // (callsites are all CompletableFuture under AQE stage jobs)
          stageNames(e.stageInfo.stageId) =
            e.stageInfo.rddInfos.sortBy(_.id).map { r =>
              val scopeName = r.scope.map(_.name).getOrElse("")
              if (scopeName.nonEmpty) scopeName else r.name
            }.distinct.mkString(" <- ")
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        synchronized {
          tasks += 1
          if (e.taskMetrics != null) {
            taskNanos += e.taskMetrics.executorRunTime * 1000000L
            val (c, s) = stageAgg.getOrElse(e.stageId, (0, 0L))
            stageAgg(e.stageId) =
              (c + 1, s + e.taskMetrics.executorRunTime)
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val picks = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      names.exists(n.startsWith) }
    picks.foreach { case (name, fn) =>
      (1 to runs).foreach { r =>
        synchronized {
          jobs = 0; stages = 0; tasks = 0; taskNanos = 0L
          jobStart.clear(); jobSpans.clear()
          stageNames.clear(); stageAgg.clear()
        }
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Guards.releaseMaterialized(spark)
        // listener events are asynchronous; give the bus a beat to drain
        Thread.sleep(150)
        println(f"[prof] $name run$r wall=$dt%.3f s jobs=$jobs " +
          f"stages=$stages tasks=$tasks taskTime=${taskNanos / 1e9}%.3f s")
        if (args.contains("stages")) synchronized {
          stageAgg.toSeq.sortBy(-_._2._2).take(12).foreach {
            case (id, (n, ms)) =>
              println(f"[prof]   stage$id tasks=$n sumTask=${ms / 1e3}%.2f s " +
                stageNames.getOrElse(id, "?"))
          }
        }
        if (args.contains("jobs")) synchronized {
          val spans = jobSpans.sortBy(_._2)
          val covered = spans.map { case (_, a, b) => b - a }.sum
          println(f"[prof]   job wall sum=${covered / 1e3}%.3f s; spans: " +
            spans.map { case (id, a, b) => s"j$id=${b - a}ms" }
              .mkString(" "))
        }
      }
    }
    spark.stop()
  }
}
