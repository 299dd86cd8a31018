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
    val cores = Runtime.getRuntime.availableProcessors()
    val b = SparkSession.builder()
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
    master.fold(b)(b.master)
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
