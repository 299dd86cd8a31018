package graft.streaming

import java.util.UUID

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.TextFunctions

/** Structured Streaming re-expression of the reference's DStream scoring
  * pipeline (/root/reference/Prediction_Pipe_Line.py:94-111).
  *
  * Differences by design:
  *   - file/parquet source with schema (vs `socketTextStream`) — replayable,
  *     partition-parallel, exactly-once with checkpointing;
  *   - the `PipelineModel` is loaded ONCE and bound into the streaming plan
  *     (the reference reloads tokenizer/cv/idf/svm from disk *inside every
  *     micro-batch* via `foreachRDD` — a driver round-trip per batch that
  *     does not survive scale);
  *   - windowed aggregations ride the same stream with watermarks, so state
  *     is bounded at any input rate.
  */
object ScoringStream {

  /** Streaming source over an events parquet path (schema taken from a
    * zero-cost batch footer read). `FileStreamSource` monitors a *directory*;
    * production points at the ingest dir, but the testdata ships a single
    * file, so a plain-file path is staged into a temp dir first (one local
    * copy, harness-only — never taken on a directory path). */
  def eventsStream(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val f = new java.io.File(path)
    val dir =
      if (f.isFile) {
        // deterministic staging dir keyed by (path, size, mtime): repeat
        // runs skip the copy, and checkpoints keyed by source path stay
        // valid across invocations on the same input file. Full-width
        // MD5 of the tuple, not a 32-bit hashCode — two distinct inputs
        // with the same basename colliding in 32 bits would silently
        // stream the FIRST file's rows (exists() skips the copy)
        val key = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$path|${f.length}|${f.lastModified}"
            .getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        val d = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), s"graft_stream_src_$key")
        val target = d.resolve(f.getName)
        if (!java.nio.file.Files.exists(target)) {
          java.nio.file.Files.createDirectories(d)
          // copy to a process-unique temp name then ATOMIC_MOVE: a JVM
          // killed mid-copy must not leave a truncated file the exists()
          // check would trust, and two concurrent first-runs must not write
          // the same temp file (the losing move is ignored — the winner
          // already published an identical copy)
          val tmp = d.resolve(
            f.getName + "." + java.util.UUID.randomUUID() + ".tmp")
          java.nio.file.Files.copy(f.toPath, tmp)
          try java.nio.file.Files.move(tmp, target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch {
            case _: java.nio.file.FileAlreadyExistsException |
                 _: java.nio.file.FileSystemException
              if java.nio.file.Files.exists(target) =>
                java.nio.file.Files.deleteIfExists(tmp)
          }
        }
        d.toString
      } else path
    val schema = spark.read.parquet(dir).schema
    // ts layout varies by generator (long nanos vs TIMESTAMP_NTZ µs) —
    // same normalization as the batch reader, see Tables.normalizeTs
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(dir))
  }

  /** Socket text source — the reference's actual ingress
    * (/root/reference/Prediction_Pipe_Line.py:101 `socketTextStream`),
    * re-expressed on the Structured Streaming socket source. Demo/test-only
    * BY DESIGN, exactly like upstream documents it: one connection, not
    * replayable, no exactly-once — production ingestion stays the
    * replayable, partition-parallel [[eventsStream]]. Exists so the
    * streaming surface is reference-faithful end-to-end; the downstream
    * pipeline ([[scoreStream]], [[windowedAgg]], dedup) is source-agnostic
    * and composes over either. Returns (line string, ingest-time ts). */
  def socketLines(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream
      .format("socket")
      .option("host", host)
      .option("port", port.toString)
      .option("includeTimestamp", "true")
      .load()
      .select(col("value").as("line"), col("timestamp").as("ts"))

  /** Watermarked windowed aggregation over the event stream. Window starts
    * ride as epoch-µs longs and value totals as integer cents (per-row
    * HALF_UP to cents, then exact long sums) so the result hash-matches a
    * DuckDB `time_bucket` oracle bit-for-bit — a double sum would differ in
    * association order between engines. */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("total_c"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("total_c"))

  /** Watermarked stream-stream inner join: enrich a live event stream with
    * a second live stream (e.g. late-arriving labels/annotations) matched
    * on a key within a bounded event-time interval. This is the join mode
    * where BOTH sides buffer state, so both constraints that make it
    * viable on unbounded feeds are mandatory and enforced here:
    *
    *   - watermarks on BOTH inputs bound how long each side's rows are
    *     retained at all;
    *   - the TIME-INTERVAL predicate (`right.ts ∈ [left.ts, left.ts +
    *     maxDelay]`) lets the state store evict a row as soon as no future
    *     match can exist for it, rather than holding every key seen within
    *     the watermark.
    *
    * Without the interval bound Spark would keep the full watermark window
    * of both streams per key — the classic unbounded-state foot-gun this
    * wrapper exists to make unrepresentable. State ≈ (events arriving
    * within maxDelay) per side, independent of stream length.
    */
  def joinStreams(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, watermark: String,
                  maxDelay: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $maxDelay"))
      .drop(col(s"r.$key"))
  }

  /** Score a stream of text-bearing rows with a trained pipeline: clean →
    * model.transform (tokenize/stopword/tf/idf/classify), exactly the
    * reference's per-batch flow but as one continuous streaming plan. */
  def scoreStream(stream: DataFrame, model: PipelineModel,
                  textCol: String): DataFrame = {
    val prepared = stream.withColumn("text", TextFunctions.cleanText(col(textCol)))
    model.transform(prepared)
      .withColumn("sentiment",
        when(col("prediction") === 1.0, lit("Positive")).otherwise(lit("Negative")))
  }

  /** Streaming exact dedup: drop rows whose key was already seen, keeping
    * state only within the watermark horizon — the streaming half of
    * [[graft.dedup.ExactDedup]]. State is bounded by (keys arriving within
    * the delay window), not by stream length, which is what makes exact
    * dedup viable on an unbounded 100 TB/day feed; duplicates farther apart
    * than the watermark are the (documented) residual risk. */
  def dedupStream(stream: DataFrame, keys: Seq[String], tsCol: String,
                  watermark: String): DataFrame = {
    require(keys.nonEmpty, "dedupStream needs at least one key column")
    stream.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Streaming MinHash near-dup suppression within the watermark horizon —
    * the streaming half of [[graft.dedup.MinHashDedup]]. Each doc's minhash
    * signature is banded with EXACTLY the batch operator's math
    * (shared [[graft.dedup.MinHashDedup.bandedFromSetsCarry]]); a doc is
    * kept iff NONE of its `bands` (band, bucket) keys was seen within the
    * watermark:
    *
    *   1. per-row (no shuffle): shingle → minhash signature → `bands`
    *      (band, bucket) rows;
    *   2. `dropDuplicatesWithinWatermark(band, bucket)` keeps the
    *      first-seen row per bucket — state bounded by (buckets arriving
    *      within the delay window), the only thing that makes LSH state
    *      viable on an unbounded feed;
    *   3. a doc survives iff ALL `bands` of its rows were first-seen
    *      (count == bands after an event-time window aggregation), i.e. it
    *      collided with NO prior doc in any band.
    *
    * Contract honesty: this is the batch candidate generator's
    * precision/recall, WITHOUT exact-Jaccard verification — a stream cannot
    * join back to already-dropped docs' shingle sets without unbounded
    * state. A colliding band from an (itself suppressed) near-dup also
    * counts as "seen" — i.e. suppression is transitive, keeping the first
    * representative of each near-dup chain, same as batch dedup keep-first.
    * SAME-MICROBATCH EDGE: when two near-dups land in one microbatch and
    * collide in ≥2 bands, `dropDuplicatesWithinWatermark`'s within-batch
    * "first seen" is arrival-order, not id-order — the wins can split so
    * NEITHER doc keeps all its bands and the whole cluster is dropped for
    * that batch. Batch-local pre-dedup would need a second stateful
    * aggregation ahead of the state store, so the operator documents the
    * edge instead: callers needing at-least-one-representative semantics
    * should run the batch canonicalizer over the stream's parquet sink
    * (the batch/stream pairing StreamingSpec exercises).
    * Emits (id, window_start_us) per kept doc once its `emitWindow` event
    * -time window finalizes (append mode, two chained stateful operators).
    */
  def dedupStreamMinHash(stream: DataFrame, idCol: String, textCol: String,
                         tsCol: String, watermark: String,
                         emitWindow: String = "10 minutes", k: Int = 3,
                         numHashes: Int = 16, bands: Int = 4): DataFrame = {
    import graft.dedup.MinHashDedup
    val banded = MinHashDedup.bandedFromSetsCarry(
      MinHashDedup.shingleSetsCarry(stream, idCol, textCol, k, Seq(tsCol)),
      numHashes, bands, Seq(tsCol))
    banded
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("band", "bucket")
      .groupBy(window(col(tsCol), emitWindow), col("id"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") === bands)
      .select(col("id"), unix_micros(col("window.start")).as("window_start_us"))
  }

  /** Streaming signature COMMIT — the streaming twin of
    * [[graft.dedup.SimHash.appendToIndex]], closing the incremental-dedup
    * write half for live feeds: sign each arriving document per-row (the
    * zero-exchange [[graft.dedup.SimHash.signatures]] expression — no
    * state, no shuffle) and append `(id, simhash)` to the persisted index
    * table with exactly-once checkpointing. Tomorrow's batch (or stream)
    * probes the same table via `nearDuplicatesAgainstIndex` — the full
    * ingest loop (probe → act → commit) now runs without any batch job in
    * the write path.
    *
    * Table ownership: the parquet STREAM sink publishes committed files
    * through its `_spark_metadata` log, which is what makes restart
    * exactly-once (a retried microbatch re-lists, never double-appends) —
    * but readers then see ONLY log-listed files, so a stream-committed
    * index dir must not also take batch [[graft.dedup.SimHash
    * .appendToIndex]] appends (those files would be invisible). One
    * writer regime per index table; both regimes read identically via
    * `spark.read.parquet`. */
  def commitSignaturesStream(docs: DataFrame, idCol: String, textCol: String,
                             indexPath: String, checkpoint: String): Unit =
    runToParquet(graft.dedup.SimHash.signatures(docs, idCol, textCol),
      indexPath, checkpoint)

  /** Streaming OOV monitor — the live half of the vocabulary-coverage
    * audit ([[graft.textstats.VocabCoverage.oovReport]]): a FROZEN `vocab`
    * (one `token` column, broadcast into every microbatch via the
    * stream-static join) watches an arriving document feed for
    * out-of-vocabulary drift — the canary for an upstream source change
    * or a tokenizer falling behind the data.
    *
    * Each microbatch appends PARTIAL per-source rows `(batch_id, source,
    * tokens, oov_tokens)` to the monitor table; occurrence counts are
    * additive, so [[readOovMonitor]]'s rollup equals the batch audit
    * EXACTLY regardless of how the feed was cut into batches (distinct
    * OOV *types* are not additive and stay batch-audit-only, documented).
    * foreachBatch's sink contract is at-least-once — a retried batch can
    * append its partials twice — so partials carry the batch id and the
    * reader collapses exact-duplicate `(batch_id, source)` rows before
    * summing: the standard idempotent-consumer pairing for a
    * non-transactional append sink. Per-batch totals stay queryable for
    * the drift timeline ("which batch spiked?"). */
  def monitorOovStream(docs: DataFrame, textCol: String, sourceCol: String,
                       vocab: DataFrame, path: String,
                       checkpoint: String): Unit = {
    // the monitorNoveltyStream rule: materialize the frozen static side
    // once, or every microbatch re-derives it from scratch. The vocab is
    // caller-supplied, so distinct it defensively — a duplicated token
    // (e.g. a union of vocab slices) would double-join every matched
    // occurrence and silently deflate oov_bp vs the batch audit (whose
    // topVocab is distinct by construction); the monitorFkStream rule.
    val v = vocab.select("token").distinct().withColumn("__in", lit(1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    v.count()
    try {
      val q = docs.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          graft.textstats.VocabCoverage.tokenStream(batch, textCol, sourceCol)
            .join(broadcast(v), Seq("token"), "left")
            .groupBy("source")
            .agg(count(lit(1)).as("tokens"),
              count(when(col("__in").isNull, 1)).as("oov_tokens"))
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(path)
          ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally v.unpersist()
  }

  /** Idempotent rollup of [[monitorOovStream]]'s monitor table: collapse
    * retry-duplicated `(batch_id, source)` partials (identical by
    * construction — max is collapse, not choice), then sum to per-source
    * totals with integer-div basis points — the batch audit's numbers. */
  def readOovMonitor(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("batch_id", "source")
      .agg(max("tokens").as("__t"), max("oov_tokens").as("__o"))
      .groupBy("source")
      .agg(sum("__t").as("tokens"), sum("__o").as("oov_tokens"))
      .withColumn("oov_bp", expr(
        "CASE WHEN tokens = 0 THEN NULL ELSE (oov_tokens * 10000) div tokens END"))

  /** Streaming half of the row-167/163 quality gate — per-microbatch
    * PARTIAL row-rule violation counts appended to a monitor table
    * (the q122 shape): row-rule violations are SUMS of per-row
    * indicators, hence additive across any batch split, so the read-side
    * rollup equals the batch audit EXACTLY. Uniqueness rules are
    * non-additive (a value unique in every batch can be duplicated
    * across them) and stay batch-side by design — the same honest
    * additivity boundary the OOV monitor draws for distinct-type counts.
    * foreachBatch's at-least-once contract is handled by the idempotent
    * pairing: partials carry batch_id, [[readRulesMonitor]] collapses
    * exact-duplicate (batch_id, rule, column) rows before summing. */
  def monitorRulesStream(docs: DataFrame,
                         rules: Seq[graft.operators.QualityRules.Rule],
                         path: String, checkpoint: String): Unit = {
    require(!rules.exists(_.isInstanceOf[graft.operators.QualityRules.Unique]),
      "uniqueness is not additive across batches; run it batch-side")
    // the audit emits the generic rule TYPE as the rule label, so two
    // rules of one type on one column write partials under the SAME
    // (batch_id, rule, column) key and the reader's retry-collapse
    // max() would silently drop one rule's counts — refuse the config
    // loudly instead (parameterizing the label would desync the batch
    // audit's oracle-pinned output)
    locally {
      val keys = rules.map(r => (r.getClass.getSimpleName, r.column))
      require(keys.distinct.size == keys.size,
        "monitorRulesStream needs at most one rule per (type, column): " +
          "duplicate keys " +
          keys.diff(keys.distinct).distinct.mkString(", ") +
          " would collide in the monitor table's retry-collapse")
    }
    val q = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.operators.QualityRules.audit(batch, rules,
            maxViolations = Long.MaxValue)
          .select(col("rule"), col("column"), col("violations"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Idempotent rollup of [[monitorRulesStream]]'s table: collapse
    * retry-duplicated (batch_id, rule, column) partials, sum, and apply
    * the pass gate — the batch audit's numbers for row rules. */
  def readRulesMonitor(spark: SparkSession, path: String,
                       maxViolations: Long = 0L): DataFrame =
    spark.read.parquet(path)
      .groupBy("batch_id", "rule", "column")
      .agg(max("violations").as("__v"))
      .groupBy("rule", "column")
      .agg(sum("__v").as("violations"))
      .withColumn("pass",
        when(col("violations") <= maxViolations, 1L).otherwise(0L))

  /** Streaming half of the row-164 rate-spike monitor — per-microbatch
    * PARTIAL (event_type, hour, count) rows appended with their batch_id:
    * hourly counts are additive, and — unlike the q122/q155 monitors —
    * partials from DIFFERENT batches legitimately share an (event_type,
    * hour) cell (a batch boundary can split an hour), so the read-side
    * first collapses retry-duplicated (batch_id, type, hour) rows, then
    * SUMS across batches. The robust median±MAD baseline is computed at
    * READ time over the summed series (a per-type global statistic has
    * no incremental form under a min-fixpoint-free definition — the same
    * honest boundary the OOV monitor draws for distinct types). */
  def monitorRateStream(events: DataFrame, typeCol: String, tsCol: String,
                        path: String, checkpoint: String): Unit = {
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.groupBy(col(typeCol).as("event_type"),
            date_trunc("hour", col(tsCol)).as("hour"))
          .agg(count(lit(1)).as("c"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Idempotent rollup + read-time baseline for [[monitorRateStream]]:
    * collapse retry duplicates, sum across batches, then the row-164
    * robust screen — the batch q148 numbers exactly. */
  def readRateMonitor(spark: SparkSession, path: String,
                      k: Int = 3): DataFrame =
    graft.operators.Robust.rateSpikes(
      spark.read.parquet(path)
        .groupBy("batch_id", "event_type", "hour")
        .agg(max("c").as("__c"))
        .groupBy("event_type", "hour")
        .agg(sum("__c").as("c")),
      "event_type", "c", k)

  /** Streaming quasi-identifier monitor — the live half of the
    * k-anonymity audit (row 222): per microbatch, PARTIAL QI-group
    * counts append with batch_id; group sizes are SUMS of per-row
    * indicators, hence additive across any batch split, so the read-side
    * rollup equals the batch spectrum EXACTLY (the q122/q155/q157
    * additivity argument, here for a privacy gate — the table is
    * re-screenable after every ingest batch without re-reading
    * history). At-least-once foreachBatch handled by the idempotent
    * (batch_id, QI) collapse on read. */
  def monitorQiStream(rows: DataFrame, qiCols: Seq[String],
                      path: String, checkpoint: String): Unit = {
    require(qiCols.nonEmpty, "monitorQiStream needs QI columns")
    val q = rows.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.groupBy(qiCols.map(col): _*)
          .agg(count(lit(1)).as("c"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Idempotent rollup for [[monitorQiStream]]: collapse retry
    * duplicates, sum across batches, then the row-222 sizes-of-sizes
    * spectrum — the batch audit exactly. */
  def readQiMonitor(spark: SparkSession, path: String,
                    qiCols: Seq[String], k: Int = 5): DataFrame = {
    val sizes = spark.read.parquet(path)
      .groupBy((qiCols :+ "batch_id").map(col): _*)
      .agg(max("c").as("__c"))
      .groupBy(qiCols.map(col): _*)
      .agg(sum("__c").as("__gs"))
    sizes
      .groupBy(col("__gs").as("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .withColumn("n_rows", col("group_size") * col("n_groups"))
      .withColumn("at_risk", (col("group_size") < k).cast("long"))
  }

  /** Streaming mixture monitor — per microbatch, ADDITIVE per-source
    * token partial sums append with batch_id; the q122/q157 additivity
    * argument on token mass, so the read-side collapse feeds the shared
    * Pareto/Gini mixture reads with the exact batch numbers after every
    * ingest batch. NULL sources are a group like any other — the batch
    * twin (q225 paretoCoverage) groups NULL-source docs too, so the
    * drained read stays exactly equal to the batch rollup even when the
    * corpus carries unattributed rows. */
  def monitorTokenStream(docs: DataFrame, srcCol: String, textCol: String,
                         path: String, checkpoint: String): Unit = {
    val q = docs.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch
          .groupBy(col(srcCol).as("source"))
          .agg(sum(graft.textstats.TextStats.wsTokenCount(col(textCol))
            .cast("long")).as("tokens"))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Idempotent read half for [[monitorTokenStream]]: collapse replays
    * on (batch_id, source), sum across batches → (source, tokens). */
  def readTokenMonitor(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("batch_id", "source")
      .agg(max("tokens").as("__t"))
      .groupBy("source")
      .agg(sum("__t").as("tokens"))

  /** Streaming content-novelty monitor — the live half of the
    * content-addressed novelty read: each microbatch fingerprints its
    * rows at the scan, left-anti-checks them against the BROADCAST
    * frozen v1 fingerprint set (stream-static, the FK-monitor idiom),
    * and appends ONE additive (grp, n_rows, n_novel) partial per group
    * with its batch_id. The novelty predicate is a stateless row fact
    * against the frozen snapshot, so indicator counts are additive
    * across any batch split and the drained shares equal the batch
    * audit EXACTLY; replays collapse on (batch_id, grp). */
  def monitorNoveltyStream(feed: DataFrame, groupCol: String,
                           encodeCols: Seq[String], v1: DataFrame,
                           path: String, checkpoint: String): Unit = {
    require(encodeCols.nonEmpty, "monitorNoveltyStream needs encode cols")
    def enc(df: DataFrame) = {
      val (h31, h37) = graft.textstats.TextStats.rowFingerprints(encodeCols)
      df.withColumn("__h31", h31).withColumn("__h37", h37)
    }
    // persist + materialize the frozen fingerprint set ONCE: a lazy
    // static side is re-evaluated (full v1 scan + fingerprint +
    // distinct) by EVERY microbatch's job — the sf1 scaling run showed
    // exactly that as a 40x blowup; cached, each batch only rebuilds
    // the broadcast from executor memory
    val old = enc(v1).select("__h31", "__h37").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    old.count()
    try {
      val q = feed.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          enc(batch)
            .join(broadcast(old.withColumnRenamed("__h31", "__o31")
              .withColumnRenamed("__h37", "__o37")),
              col("__h31") === col("__o31") && col("__h37") === col("__o37"),
              "left")
            .groupBy(col(groupCol).as("grp"))
            .agg(count(lit(1)).as("n_rows"),
              sum(when(col("__o31").isNull, 1L).otherwise(0L))
                .as("n_novel"))
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(path)
          ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally old.unpersist()
  }

  /** Idempotent read half for [[monitorNoveltyStream]]: collapse
    * replayed batches, sum the additive partials, emit the
    * q276-shaped per-group shares. */
  def readNoveltyMonitor(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("batch_id", "grp")
      .agg(max("n_rows").as("__r"), max("n_novel").as("__n"))
      .groupBy("grp")
      .agg(sum("__r").as("n_rows"), sum("__n").as("n_novel"))
      .withColumn("novel_bp",
        expr("(10000 * n_novel) div greatest(n_rows, 1)"))
      .select("grp", "n_rows", "n_novel", "novel_bp")

  /** Streaming referential-integrity monitor — the live half of the FK
    * audit: each microbatch left-joins the BROADCAST distinct parent-key
    * frame (stream-static, the q152 idiom) and writes ONE partial
    * indicator row (n_rows, n_orphans, n_null_fk) with its batch_id.
    * Indicator counts are additive across any batch split, so the
    * read-side sum equals the batch audit EXACTLY; at-least-once
    * replays absorbed by the per-batch_id max collapse. The contract is
    * a FROZEN parent snapshot for the run — a parent table mutating
    * mid-stream is a different (CDC) problem, row 190's. */
  def monitorFkStream(child: DataFrame, fkCol: String,
                      parentKeys: DataFrame, pkCol: String,
                      path: String, checkpoint: String): Unit = {
    // the monitorNoveltyStream rule: materialize the frozen parent-key
    // set once, not per microbatch
    val p = parentKeys.select(col(pkCol).as("__pk")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    try {
      val q = child.writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          batch.select(col(fkCol).as("__fk"))
            .join(broadcast(p), col("__fk") === col("__pk"), "left")
            .agg(
              count(lit(1)).as("n_rows"),
              sum(when(col("__fk").isNotNull && col("__pk").isNull, 1L)
                .otherwise(0L)).as("n_orphans"),
              sum(when(col("__fk").isNull, 1L).otherwise(0L))
                .as("n_null_fk"))
            .withColumn("batch_id", lit(id))
            .write.mode("append").parquet(path)
          ()
        }
        .option("checkpointLocation", checkpoint)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally p.unpersist()
  }

  /** Idempotent read half for [[monitorFkStream]]: collapse replayed
    * batches, sum the additive partials, emit the q248-shaped audit
    * row. */
  def readFkMonitor(spark: SparkSession, path: String,
                    name: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("batch_id")
      .agg(max("n_rows").as("__r"), max("n_orphans").as("__o"),
        max("n_null_fk").as("__n"))
      .agg(sum("__r").as("n_rows"), sum("__o").as("n_orphans"),
        sum("__n").as("n_null_fk"))
      .select(lit(name).as("fk_name"), col("n_rows"), col("n_orphans"),
        col("n_null_fk"),
        expr("(10000 * n_orphans) div greatest(n_rows, 1)")
          .as("orphan_bp"))

  /** Streaming sessionization, monitor-pattern — each microbatch writes
    * its own PARTIAL sub-sessions ([[Sessionize.subSessions]]) appended
    * with batch_id; no cross-batch state, so there is no watermark race
    * and no unflushed-open-session hole at end of stream (the reason the
    * flatMapGroupsWithState path can't be held to an exact drain oracle).
    * [[readSessionMonitor]] recovers the batch answer EXACTLY for any
    * batch split — the merge-correctness argument lives on
    * [[Sessionize.mergeSubSessions]]. */
  def sessionPartialsStream(events: DataFrame, gapMinutes: Int,
                            path: String, checkpoint: String): Unit = {
    val q = events.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        Sessionize.subSessions(batch, gapMinutes)
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(path)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Idempotent read half for [[sessionPartialsStream]]: retry
    * duplicates collapse on (batch_id, user_id, start_us) — a batch's
    * sub-session starts are unique per key, and a replayed batch rewrites
    * identical rows — then the gap merge reassembles true sessions. */
  def readSessionMonitor(spark: SparkSession, path: String,
                         gapMinutes: Int): DataFrame = {
    val subs = spark.read.parquet(path)
      .groupBy("batch_id", "user_id", "start_us")
      .agg(max("last_us").as("last_us"),
        max("n_events").as("n_events"),
        max("value_c").as("value_c"))
    Sessionize.mergeSubSessions(subs, gapMinutes)
  }

  /** Streaming MERGE / CDC ingestion — a live change feed (id, op,
    * payload) folded into an evolving snapshot: each microbatch applies
    * [[graft.operators.Merge.applyChanges]] against the CURRENT
    * generation and writes the next as `workDir/gen_<batchId>` — a
    * poor-man's time travel: every generation stays readable until
    * compaction. Restart-safe: a replayed batch rewrites ITS OWN
    * generation (same id → same path, overwrite mode), so at-least-once
    * redelivery converges to the same chain ([[readLatestSnapshot]]
    * trusts only `_SUCCESS`-complete generations).
    *
    * Exactness (the q152 stateless-twin argument, lifted one level):
    * change ids are disjoint across a well-formed feed (one change per
    * id), and fold of disjoint-id batches equals the one-shot batch
    * apply — so the drained final snapshot EQUALS
    * `Merge.applyChanges(base, allChanges)` whatever the microbatch
    * boundaries. */
  def mergeStream(changes: DataFrame, basePath: String, workDir: String,
                  idCol: String, checkpoint: String): Unit = {
    val q = changes.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val spark = batch.sparkSession
        val cur = latestSnapshotPath(workDir, belowGen = id)
          .getOrElse(basePath)
        graft.operators.Merge
          .applyChanges(spark.read.parquet(cur), batch, idCol)
          .write.mode("overwrite").parquet(s"$workDir/gen_$id")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Highest `_SUCCESS`-complete generation under `workDir` strictly
    * below `belowGen` (pass Long.MaxValue for "latest"). */
  private def latestSnapshotPath(workDir: String,
                                 belowGen: Long): Option[String] = {
    val gens = Option(new java.io.File(workDir).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("gen_") &&
        new java.io.File(f, "_SUCCESS").exists())
      .map(_.getName.stripPrefix("gen_").toLong)
      .filter(_ < belowGen)
    if (gens.isEmpty) None else Some(s"$workDir/gen_${gens.max}")
  }

  /** The current snapshot after [[mergeStream]] drained. */
  def readLatestSnapshot(spark: SparkSession, workDir: String,
                         basePath: String): DataFrame =
    spark.read.parquet(
      latestSnapshotPath(workDir, Long.MaxValue).getOrElse(basePath))

  /** Production file sink: append the streaming frame to a parquet
    * directory with exactly-once checkpointing, draining everything
    * currently available (AvailableNow) before returning. Restarting with
    * the same checkpoint resumes where the last run stopped instead of
    * re-emitting — the file-sink/checkpoint pair is what makes the pipeline
    * replayable end-to-end. */
  def runToParquet(df: DataFrame, path: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain a (bounded) streaming frame synchronously into an in-memory table
    * and return it — test/verify harness, not a production sink.
    *
    * `statePartitions`: number of shuffle (= state-store) partitions for
    * THIS streaming query, restored afterward. Stateful operators commit
    * one state store per partition per microbatch, so partition count is
    * sized to stream volume — a per-query deployment knob in any real
    * streaming job (more partitions for a 100 TB/day feed, fewer for a
    * bounded replay), not a benchmark trick: the state machinery is the
    * same, only its fan-out changes. */
  def runToMemory(spark: SparkSession, df: DataFrame,
                  outputMode: String, statePartitions: Option[Int]): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try runToMemory(spark, df, outputMode)
    finally spark.conf.set(key, prev)
  }

  def runToMemory(spark: SparkSession, df: DataFrame,
                  outputMode: String): DataFrame = {
    val name = "graft_stream_" + UUID.randomUUID().toString.replace("-", "")
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
