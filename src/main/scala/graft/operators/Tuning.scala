package graft.operators

import org.apache.spark.sql.SparkSession

/** The cluster-scale partition-tuning story: derive the shuffle/scan
  * partitioning knobs from DATA SIZE, not folklore constants.
  *
  * Spark's AQE coalescer only merges DOWNWARD from
  * `spark.sql.adaptive.coalescePartitions.initialPartitionNum` (falling
  * back to `spark.sql.shuffle.partitions`) — it never splits an
  * under-partitioned shuffle. So the one number that must be sized to the
  * job is the UPPER bound: high enough that `inputBytes / n` fits executor
  * memory with headroom, and AQE shrinks small stages back down for free.
  * At 100 TB with 128 MiB targets that is ~800k initial partitions — a
  * number nobody should type by hand, hence this advisor:
  *
  *   - `initialPartitionNum` = ⌈inputBytes / targetPartitionBytes⌉, clamped
  *     below by total cluster cores (anything less idles hardware on the
  *     first wide stage) and above by `maxPartitions` (per-partition
  *     scheduler overhead ~O(n) on the driver; past ~200k the task-launch
  *     bookkeeping itself becomes the bottleneck — raise the target bytes
  *     instead).
  *   - `spark.sql.files.maxPartitionBytes` gets the same byte target so
  *     SCAN parallelism matches shuffle parallelism.
  *   - `spark.sql.shuffle.partitions` is set too as the non-AQE fallback
  *     (stateful streaming disables AQE by design).
  *
  * All advised keys are runtime-settable SQLConf entries — [[apply]] takes
  * effect on a live session, no restart.
  */
object Tuning {

  final case class Advice(initialPartitionNum: Int,
                          targetPartitionBytes: Long,
                          confs: Map[String, String])

  def advise(inputBytes: Long, clusterCores: Int,
             targetPartitionBytes: Long = 128L << 20,
             maxPartitions: Int = 200000): Advice = {
    require(inputBytes >= 0, s"inputBytes must be >= 0, got $inputBytes")
    require(clusterCores >= 1 && targetPartitionBytes >= 1 && maxPartitions >= 1)
    val byBytes = (inputBytes + targetPartitionBytes - 1) / targetPartitionBytes
    val n = math.min(maxPartitions.toLong,
      math.max(clusterCores.toLong, byBytes)).toInt
    Advice(n, targetPartitionBytes, Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> n.toString,
      "spark.sql.shuffle.partitions" -> n.toString,
      "spark.sql.files.maxPartitionBytes" -> targetPartitionBytes.toString))
  }

  /** Bytes on disk under `dir` for the named tables — the advisor's input,
    * measured from the actual files (driver-side fs metadata listing only;
    * no data read). */
  def inputBytes(spark: SparkSession, dir: String,
                 tables: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    tables.map { t =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/$t.parquet")
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    }.sum
  }

  /** Apply the advice to a live session (all keys are runtime SQLConf). */
  def apply(spark: SparkSession, advice: Advice): Unit =
    advice.confs.foreach { case (k, v) => spark.conf.set(k, v) }
}
