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

  /** Join-skew diagnosis for a key column — the report read BEFORE
    * choosing between a plain join, AQE skew split (row 87) and a manual
    * salted join (row 48): the `topK` heaviest keys with their share of
    * all rows and the salt factor that would level each back to the
    * median key's weight (salt_factor = ⌈n / median⌉ — the exact
    * argument [[graft.operators.Relational.saltedJoin]] takes).
    *
    * Exact and scale-safe: per-key counts are one map-side-combined
    * aggregate; the median key weight is the lower-nearest-rank
    * [[Robust.groupQuantile]] over the count-of-counts histogram; the
    * top-k ride the map-side-capped string aggregator (no key-domain
    * window sort); the two single-row stats frames attach via the q112
    * broadcast-crossJoin precedent. NULL keys are excluded (they
    * never match an equi-join anyway). */
  def skewReport(df: org.apache.spark.sql.DataFrame, keyCol: String,
                 topK: Int = 10): org.apache.spark.sql.DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("key"))
      .groupBy("key").agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = Robust.groupQuantile(
      counts.withColumn("__g", lit(1)), "__g", "n", 5000)
      .select(col("q_value").as("med"))
    val tot = counts.agg(sum("n").as("tot"))
    val topkAgg = new graft.functions.TopKStrAggregator(topK).toColumn
    val top = counts.as[(String, Long)]
      .groupByKey(_ => 1)
      .mapValues(identity)
      .agg(topkAgg.name("topk"))
      .toDF("__one", "topk")
      .select(posexplode(col("topk")))
      .select(col("col._1").as("key"), col("col._2").as("n"),
        (col("pos") + 1).cast("int").as("rank"))
    top.crossJoin(broadcast(med)).crossJoin(broadcast(tot))
      .select(col("key"), col("n"),
        expr("(10000 * n) div tot").as("share_bp"),
        expr("(n + med - 1) div med").as("salt_factor"),
        col("rank"))
  }
}
