package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table access for the testdata star schema (TESTDATA.md).
  *
  * The reference reads header CSVs (/root/reference/Yelp_Data_PreProcessing.py:53)
  * and writes CSV (:158); here sources are columnar parquet so Catalyst's
  * predicate pushdown and column pruning reach the scan — at 100 TB the
  * difference between scanning two columns and scanning a row-oriented file
  * is the whole job.
  */
object Tables {

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** Normalize an event frame's `ts` column to TimestampType whatever the
    * parquet writer produced — generators have shipped TIMESTAMP(NANOS)
    * (readable only as long via the legacy nanos-as-long conf) and plain
    * TIMESTAMP(MICROS) with isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
    * The session timezone is pinned to UTC (GraftSession), so the NTZ→TZ
    * cast is instant-preserving and both layouts yield the identical
    * micros-since-epoch column the oracles and window math assume. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      // integer `div`, NOT `/`: Divide promotes the long nanos (~1.7e18,
      // past double's 2^53 exact range) to double, corrupting ~1.5% of
      // timestamps by 1 µs after truncation
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")

  /** Overwrite-mode columnar sink (ref writes CSV, Yelp_Data_PreProcessing.py:158). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Header CSV source, faithful to the reference's reader
    * (Yelp_Data_PreProcessing.py:53 `csv(..., header=True)`). Pass a schema
    * whenever one is known: schema inference is a full extra pass over the
    * data — fine on a laptop, a second 100 TB scan in production. */
  def readCsv(spark: SparkSession, path: String,
              schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** Header CSV sink, overwrite mode (ref Yelp_Data_PreProcessing.py:158). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** ORC columnar sink, overwrite mode — the second columnar format Spark
    * ships natively (Hive-ecosystem consumers read ORC where the
    * lakehouse reads parquet). Same planner contract as parquet: filter
    * pushdown and column pruning reach the ORC reader, so switching a
    * table's layout is a write-path swap, not a query rewrite. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC source (native vectorized reader). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSONL (newline-delimited JSON) source. The schema is REQUIRED, not
    * inferred: Spark's JSON schema inference is a full extra pass over the
    * data — a second 100 TB scan — and silently widens types on dirty rows.
    * With an explicit schema the reader is a single streaming pass and rows
    * that don't parse surface under `columnNameOfCorruptRecord` instead of
    * mutating the schema. */
  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSONL sink, overwrite mode — the interchange format every tokenizer /
    * curation tool in the training-data world reads. */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** JSONL source with a malformed-record QUARANTINE column: rows that
    * fail to parse land whole in `_corrupt_record` (PERMISSIVE mode)
    * instead of aborting the job or silently vanishing — at 100 TB a
    * crawler feed ALWAYS contains breakage, and the honest ingest reads
    * everything, counts the damage, and routes bad lines to a quarantine
    * sink rather than failing the batch (FAILFAST) or dropping evidence
    * (DROPMALFORMED). Filter `_corrupt_record IS NULL` for the clean
    * side; the non-null side is the quarantine. */
  def readJsonlQuarantine(spark: SparkSession, path: String,
                          schema: org.apache.spark.sql.types.StructType)
      : DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Schema-evolution parquet read: merge the schemas of ALL part files
    * (`mergeSchema`) instead of trusting one file's footer — the read
    * path for corpora whose schema grew over time (a 100 TB corpus is
    * written over months; later partitions carry columns earlier ones
    * lack, and rows from old files surface the new columns as NULL).
    * Costs one footer read per file at planning time (footers only —
    * no data pass), which is why Spark defaults it OFF and this helper
    * exists to opt in deliberately where evolution is real. */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Save as a bucketed+sorted managed table. Two tables bucketed the same
    * way on their join key co-locate: the join compiles with NO Exchange on
    * either side (SortMergeJoin straight over the bucket files). At 100 TB
    * this converts every repeated fact⋈fact join on the bucket key from a
    * full-data shuffle into a local merge — the single biggest lever for
    * join-heavy pipelines; BucketingSpec asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Range-partitioned, sorted parquet write: every output file covers a
    * tight, NON-OVERLAPPING range of `key`, and rows inside each file are
    * key-sorted — so each file's parquet min/max statistics actually
    * exclude it for out-of-range predicates, and row groups inside prune
    * further. A hash-partitioned write scatters every key range across
    * every file (each file's min/max spans the whole domain ⇒ statistics
    * prune NOTHING); at 100 TB the difference between the two layouts is
    * reading one file versus all of them for a key-range query. This is
    * the write-side half of scan pruning — the read side (pushdown) is
    * asserted by PlanAuditSpec.
    *
    * `repartitionByRange` samples the key distribution to place the
    * boundaries, so skewed keys still yield balanced files (a static
    * hand-picked boundary list would not). */
  def writeRangeLayout(df: DataFrame, path: String, key: String,
                       nFiles: Int): Unit =
    df.repartitionByRange(nFiles, org.apache.spark.sql.functions.col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Hive-partitioned write: one `key=value/` directory per distinct value
    * of the partition columns; values live in directory NAMES, not data
    * files, so a filtered scan prunes whole directories at PLANNING time —
    * zero I/O, zero tasks for excluded partitions (the scan node's
    * `PartitionFilters`, vs min/max statistics which still open files).
    *
    * Low-cardinality keys ONLY (lang, source, dt): every distinct value is
    * a directory, and a high-cardinality partition key is the classic
    * small-files outage — 10⁶ ids × 1000 executors = 10⁹ tiny files. Guard
    * rail: the caller states the expected cardinality ceiling and the
    * write fails fast if the data exceeds it (one cheap distinct-count on
    * the key columns — catching the outage before 10⁹ files exist is worth
    * one aggregation job). */
  def writePartitioned(df: DataFrame, path: String, keys: Seq[String],
                       maxPartitions: Int = 10000): Unit = {
    import org.apache.spark.sql.functions.col
    val n = df.select(keys.map(col): _*).distinct().count()
    require(n <= maxPartitions,
      s"partition key ${keys.mkString(",")} has $n distinct values " +
        s"(> $maxPartitions): high-cardinality partition keys create the " +
        "small-files problem; bucket or range-partition instead")
    df.write.mode("overwrite").partitionBy(keys: _*).parquet(path)
  }

  /** Small-file compaction — the OPTIMIZE pass every long-lived corpus
    * needs: streaming sinks, CDC generations and per-partition writers
    * leave thousands of tiny files, and at 100 TB the per-file open/
    * footer/list overhead (plus driver memory for the file index)
    * dominates scan cost long before data volume does. Rewrites `inPath`
    * to `outPath` with ⌈bytes / targetFileBytes⌉ output files (at least
    * one), content-identical — layout changes, rows never do. The file
    * count derives from the ACTUAL byte size on disk, not a guess; pair
    * with [[writeRangeLayout]] when the compacted table should also
    * prune. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetFileBytes: Long = 128L << 20): Unit = {
    require(targetFileBytes >= (1L << 20),
      s"targetFileBytes must be >= 1 MiB, got $targetFileBytes")
    def sizeOf(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).getOrElse(Array.empty[java.io.File])
          .map(sizeOf).sum
      else f.length
    val bytes = sizeOf(new java.io.File(inPath))
    val nFiles = math.max(1L,
      (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outPath)
  }

  /** Z-order clustered write: rows are laid out along a Morton
    * (bit-interleaved) curve over TWO keys, so each output file covers a
    * tight rectangle in (a, b) space and parquet min/max statistics prune
    * on EITHER column — [[writeRangeLayout]] gives perfect pruning on one
    * key and none on the other; this gives ~√F-of-domain pruning on both
    * (the Delta/Iceberg OPTIMIZE ZORDER layout).
    *
    * Keys are first rank-bucketed to 2^bits dense ids with
    * [[graft.operators.Sampling.scoreNtile]] (an exact histogram ntile, no
    * corpus-wide rank window) — interleaving RAW values would let one
    * skewed/wide column dominate the curve; rank buckets make the curve
    * follow the data distribution (what OPTIMIZE ZORDER does with its
    * range-ids). The z-value itself is 2·bits of pure per-row bit math. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    nFiles: Int, bits: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1 << bits
    val ranked = graft.operators.Sampling
      .scoreNtile(df, colA, colB, n).withColumnRenamed("bucket", "__za")
    val ranked2 = graft.operators.Sampling
      .scoreNtile(ranked, colB, colA, n).withColumnRenamed("bucket", "__zb")
    val a = (col("__za") - 1).cast("long")
    val b = (col("__zb") - 1).cast("long")
    val z = (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)
    ranked2.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(path)
  }
}
