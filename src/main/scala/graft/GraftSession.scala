package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

/** Opinionated SparkSession factory for the graft engine — the
  * configuration story in one place, so every entry point (user code,
  * Verify, Bench, notebooks) runs with the same posture:
  *
  *   - AQE on (runtime partition coalescing + skew-join splitting carry the
  *     same plans from local[32] to a 1000-executor cluster),
  *   - shuffle partitions sized to the machine locally (the 200 default is
  *     a cluster number; AQE re-coalesces on real clusters anyway),
  *   - graft's native expressions registered (minhash_sig in SQL),
  *   - nanos-as-long parquet reading for TIMESTAMP(NANOS) sources,
  *   - UTC session timezone (oracle comparisons and window math are
  *     timezone-free by construction).
  */
object GraftSession {

  def builder(master: Option[String] = None,
              shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
    // Size shuffle partitions to the machine ONLY in local mode (or when
    // the caller asks). On a cluster the driver's core count says nothing
    // about executor parallelism, and AQE coalescing only merges DOWNWARD
    // from the configured number — defaulting it low would cap every
    // shuffle at submit-node width. Cluster deployments keep Spark's
    // default / their own tuning.
    val localCores =
      if (master.exists(_.startsWith("local")))
        Some(Runtime.getRuntime.availableProcessors()) else None
    val withParts = shufflePartitions.orElse(localCores)
      .fold(b)(n => b.config("spark.sql.shuffle.partitions", n.toString))
    master.fold(withParts)(withParts.master)
  }

  /** Build (or reuse) the session and ensure graft functions are registered
    * even if an existing session predates the extensions hook. */
  def getOrCreate(master: Option[String] = None,
                  shufflePartitions: Option[Int] = None): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    GraftExtensions.register(s)
    s
  }
}
