package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** 64-bit SimHash near-duplicate detection (Charikar '02, the scheme Google
  * described in Manku et al. WWW'07).
  *
  * The whole signature is computed *per row* with Catalyst higher-order
  * functions — zero shuffles for signature construction, which is the right
  * shape at 100 TB (the only exchanges are the small band-bucket self-join
  * for candidate generation). Per-bit token-hash votes are summed with
  * `aggregate`; the 64-bit fingerprint is folded together with bitwise OR.
  *
  * Candidate generation uses the standard Hamming-space trick: split the
  * 64-bit fingerprint into 4 × 16-bit chunks; any pair within Hamming
  * distance ≤ 3 must agree on at least one chunk, so an equi-join on
  * (chunk-index, chunk-value) finds all of them without an all-pairs scan.
  */
object SimHash {

  /** 64-bit simhash of a *materialized* token-hash (long array) column.
    * The 64 per-bit vote tallies are integer `getbit` sums over that array
    * (bit b set iff ones(b) > n/2 — identical to the ±1-vote formulation but
    * with no re-hashing). `th` MUST be a real column, not an inline
    * expression: a non-trivial expression referenced inside a lambda is
    * re-evaluated per array element (here: 64×). */
  def simhash64(th: Column): Column = {
    val n = size(th)
    // ones(b) = Σ_tokens bit b of the token hash
    val ones = transform(sequence(lit(0), lit(63)), b =>
      aggregate(th, lit(0), (acc, h) => acc + getbit(h, b).cast("int")))
    // fingerprint = OR over b of (2·ones(b) > n ? 1L << b : 0L)
    aggregate(
      zip_with(ones, sequence(lit(0), lit(63)), (o, b) =>
        when(o * 2 > n, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b))

  /** (id, simhash) signatures for a text column — per-row native codegen
    * ([[graft.functions.SimHash64]]): tokenize → hash each token once →
    * one-pass 64-bit fingerprint. ZERO exchanges: signature construction is
    * embarrassingly parallel, the shape that matters when the input is
    * 100 TB of documents. Null-text rows are dropped (they have no
    * signature), matching the aggregation formulation's semantics. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    docs
      .select(col(idCol).as("id"),
        transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t)).as("th"))
      .filter(col("th").isNotNull)
      .select(col("id"),
        graft.functions.SimHash64(spark, col("th")).as("simhash"))
  }

  /** Aggregation formulation of [[signatures]], kept as the cross-checked
    * alternative (DedupSpec asserts equality with the native expression):
    * explode tokens → hash each once → groupBy(id) with 64 `sum(getbit)`
    * aggregates → fold the 64 tallies into the fingerprint. Map-side partial
    * aggregation collapses each doc's tokens before the exchange, so the
    * shuffle carries one 64-int row per doc — efficient, but still one
    * exchange the per-row expression doesn't need. */
  def signaturesAgg(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs
      .select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val tallies = hashed.groupBy("id").agg(
      count(lit(1)).as("n"),
      (0 until 64).map(b => sum(getbit(col("h"), lit(b)).cast("int")).as(s"b$b")): _*)
    val fp = (0 until 64)
      .map(b => when(col(s"b$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    tallies.select(col("id"), fp.as("simhash"))
  }

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming ≤ 7, via
    * multi-probe: by pigeonhole, two fingerprints within distance 7 have
    * some 16-bit chunk differing in at most ⌊7/4⌋ = 1 bit, so one join side
    * emits every ≤1-bit-flip variant of each chunk (17 rows per chunk) and
    * the other side its originals — `variant(A) = original(B)` iff that
    * chunk's diff has weight ≤ 1. Complete for the full radius at 17× the
    * probe side's bucket rows (still linear, never all-pairs); exact
    * hamming verification filters the superset. */
  def nearDuplicatesMultiProbe(docs: DataFrame, idCol: String, textCol: String,
                               maxHamming: Int = 7): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"multi-probe over 4x16-bit chunks is complete only to radius 7, got $maxHamming")
    // both join branches (variant-exploded probe side, original side) consume
    // the signature frame, and the two branches differ so exchange reuse
    // can't collapse them — persist the expensive signature pass once
    // (same diamond-plan rule as MinHashDedup.nearDuplicates)
    val sig = graft.Guards.materialize(signatures(docs, idCol, textCol))
    def chunks(withVariants: Boolean) = {
      val base = sig.select(col("id"), col("simhash"),
        posexplode(array((0 until 4).map(c =>
          shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
        .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))
      if (!withVariants) base
      else base.select(col("id"), col("simhash"), col("band"),
        explode(array((lit(0L) +: (0 until 16).map(b => lit(1L << b))).map(f =>
          col("chunk").bitwiseXOR(f)): _*)).as("chunk"))
    }
    chunks(withVariants = true).as("l").join(chunks(withVariants = false).as("r"),
        col("l.band") === col("r.band") &&
          col("l.chunk") === col("r.chunk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming(col("l.simhash"), col("r.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Near-duplicate pairs with Hamming distance ≤ maxHamming. Bucketed by
    * 16-bit chunks — complete for maxHamming ≤ 3 by pigeonhole over 4
    * chunks, and REJECTED above that: a larger radius silently returns an
    * incomplete subset (pairs spreading their diff bits across all four
    * chunks never share a bucket), and narrower chunks collide so heavily
    * the join degenerates toward all-pairs. Radius 4-7 callers:
    * [[nearDuplicatesMultiProbe]]. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 3): DataFrame =
    nearDuplicatesFromSignatures(signatures(docs, idCol, textCol), maxHamming)

  /** The Hamming-bucket join alone, over an ALREADY-COMPUTED `(id, simhash)`
    * frame — the signature source is a parameter, not an assumption, so any
    * 64-bit hash whose Hamming distance means "similar" plugs in: text
    * SimHash ([[nearDuplicates]] delegates here), image perceptual dHash
    * ([[graft.multimodal.ImageDedup.nearDupImages]]), or a persisted
    * signature table read back from parquet (no re-hashing at all — the
    * incremental-ingest shape). Completeness contract identical to
    * [[nearDuplicates]]: radius ≤ 3 by pigeonhole over 4 chunks. */
  def nearDuplicatesFromSignatures(signatures: DataFrame,
                                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit chunk LSH is only complete for maxHamming <= 3, got $maxHamming")
    // self-join diamond: persist the signature pass (see multi-probe note) —
    // the two sides are identical here, but exchange reuse is best-effort
    // and AQE re-optimization can break it; persist makes the reuse a
    // contract, not a hope
    selfJoinPersisted(graft.Guards.materialize(
      signatures.select(col("id"), col("simhash"))),
      maxHamming)
  }

  /** The self-join half of [[nearDuplicatesFromSignatures]] over an
    * ALREADY-PERSISTED `(id, simhash)` frame — split out so
    * [[incrementalNearDups]] can feed ONE cache entry to both of its
    * legs (calling the public method would persist a second Project of
    * the same rows: CacheManager matches analyzed plans, not data). */
  private def selfJoinPersisted(sig: DataFrame, maxHamming: Int): DataFrame = {
    val chunked = chunk16(sig)
    chunked.as("l").join(chunked.as("r"),
        col("l.band") === col("r.band") &&
          col("l.chunk") === col("r.chunk") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        hamming(col("l.simhash"), col("r.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** (id, [carry...,] simhash, band, chunk) — each signature exploded into
    * its four 16-bit chunks, the bucket key of every Hamming join here.
    * `private[graft]` so cross-modal composers
    * ([[graft.multimodal.VideoDedup.framesMatchingImages]]) can reuse the
    * bucket layout; `carry` columns (e.g. a frame index) ride along. */
  private[graft] def chunk16(sig: DataFrame,
                             carry: Seq[String] = Nil): DataFrame =
    sig.select(Seq(col("id")) ++ carry.map(col) ++ Seq(col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))): _*)
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "chunk"))

  /** Incremental Hamming near-dup: today's `probeSigs` against an
    * already-built `indexSigs` table (both `(id, simhash)` — the index
    * typically read back from parquet, signatures never recomputed), the
    * signature-join twin of
    * [[graft.dedup.MinHashDedup.incrementalNearDups]]. Join strategy is
    * sized to the asymmetry: the increment's chunk rows BROADCAST onto the
    * index's chunk scan (a daily batch is tiny against the corpus — the
    * index is probed in place, never shuffled). Same radius-≤3 pigeonhole
    * completeness contract as [[nearDuplicatesFromSignatures]]. Output:
    * (new_id, dup_id, hamming), `dup_id` an indexed id; ids must be
    * disjoint across index and probe. */
  def nearDuplicatesAgainstIndex(indexSigs: DataFrame, probeSigs: DataFrame,
                                 maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit chunk LSH is only complete for maxHamming <= 3, got $maxHamming")
    chunk16(indexSigs.select(col("id"), col("simhash"))).as("l")
      .join(broadcast(chunk16(probeSigs.select(col("id"), col("simhash")))).as("r"),
        col("l.band") === col("r.band") && col("l.chunk") === col("r.chunk"))
      .select(col("r.id").as("new_id"), col("l.id").as("dup_id"),
        hamming(col("l.simhash"), col("r.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The full incremental-ingest composition every modality shares:
    * today's `probeSigs` against the persisted `indexSigs`
    * ([[nearDuplicatesAgainstIndex]] — cross-batch pairs), PLUS
    * within-batch pairs from the ordinary self-join on the increment
    * alone, reoriented to the same (new_id, dup_id, hamming) schema. The
    * probe projection is persisted exactly ONCE here and feeds both legs
    * ([[selfJoinPersisted]] exists so the within leg doesn't re-persist a
    * second Project of the same rows). Cache contract: the Verify/Bench
    * clearCache-per-query convention releases it; long-lived callers
    * should `spark.catalog.clearCache()` after materializing. Modality
    * wrappers ([[graft.multimodal.ImageDedup.incrementalNearDupImages]]
    * and the audio/video twins) are one renamed-column call each — the
    * composition, orientation rule, and cache lifecycle live only
    * here. */
  def incrementalNearDups(indexSigs: DataFrame, probeSigs: DataFrame,
                          maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16-bit chunk LSH is only complete for maxHamming <= 3, got $maxHamming")
    val probe = graft.Guards.materialize(
      probeSigs.select(col("id"), col("simhash")))
    val cross = nearDuplicatesAgainstIndex(indexSigs, probe, maxHamming)
    val within = selfJoinPersisted(probe, maxHamming)
      .select(col("id_b").as("new_id"), col("id_a").as("dup_id"),
        col("hamming"))
    cross.unionByName(within)
  }

  /** Commit a batch's `(id, simhash)` signatures into a persisted index
    * table (parquet append) — the WRITE half of the incremental loop:
    * probe today's batch with [[incrementalNearDups]], act on the pairs,
    * then commit the batch here so tomorrow's probe sees today's
    * documents. Appending parquet files is atomic at file granularity
    * and never rewrites history, so the index grows by exactly the
    * increment — at 100 TB the index table is only ever appended and
    * scanned, never shuffled. NOTE: for user-owned index tables, not the
    * engine's content-hash staged artifacts (those are pure functions of
    * (code, data) and must not be mutated). */
  def appendToIndex(sigs: DataFrame, path: String): Unit =
    sigs.select(col("id"), col("simhash"))
      .write.mode("append").parquet(path)

  /** Compact a generational signature index — the MAINTENANCE half of the
    * incremental loop that [[appendToIndex]] grows: day-over-day appends
    * accumulate (a) stale rows for re-signed ids (a document edited after
    * ingest gets a new signature appended under a later generation) and
    * (b) rows for documents since deleted from the corpus. Compaction
    * rewrites the index to exactly one live row per surviving id:
    *
    *   - `index` is `(id, simhash, gen)` with `gen` the append generation
    *     (a batch number / ingest date); the winner per id is the
    *     lexicographic max of (gen, simhash) — newest generation, and a
    *     deterministic max-simhash tie-break if one (id, gen) was ever
    *     double-appended, so the output is reproducible whatever the row
    *     order.
    *   - `tombstones` is the deleted-id set, dropped via LEFT ANTI join.
    *
    * Scale shape: the winner selection is ONE map-side-combined
    * `max(struct(gen, simhash))` groupBy — each partition ships at most
    * one candidate per id it touches, never the append history — and the
    * tombstone set (deletes are a trickle next to the corpus, by
    * contract) broadcasts onto the result. Nothing wider than
    * (id, 2×long) ever shuffles. Output `(id, simhash)` is exactly the
    * schema [[nearDuplicatesAgainstIndex]] probes, so
    * `compactIndex(...).write.mode("overwrite")` is the whole compaction
    * job. */
  def compactIndex(index: DataFrame, tombstones: DataFrame): DataFrame =
    index.select(col("id"), col("simhash"), col("gen"))
      .groupBy("id")
      .agg(max(struct(col("gen"), col("simhash"))).as("__w"))
      .select(col("id"), col("__w.simhash").as("simhash"))
      .join(broadcast(tombstones.select("id")), Seq("id"), "left_anti")
}
