package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection, banded (never all-pairs).
  *
  * Classic scheme (Broder '97; Leskovec/Rajaraman/Ullman ch. 3), built
  * entirely from Catalyst higher-order functions — no UDFs, no ml.Vector
  * boxing:
  *
  *   1. word k-shingles per document, each hashed ONCE to a 64-bit long
  *      (`xxhash64` over the k-token window of the per-token hash array),
  *   2. an `numHashes`-long minhash signature via the seeded family
  *      `h_i(s) = xxhash64(i, s)` over the long array — fixed-width integer
  *      hashing, no string re-hashing,
  *   3. signatures split into `bands` bands of `numHashes/bands` rows; each
  *      band hashed to a bucket key,
  *   4. candidate pairs = self-equi-join on (band, bucket) — the shuffle is
  *      keyed by bucket, so work is linear in data + bucket sizes; there is
  *      **no** CartesianProduct / BroadcastNestedLoopJoin in the plan (test
  *      asserts this),
  *   5. candidates verified with exact Jaccard over the distinct
  *      shingle-hash sets (joined back by id — the wide arrays never ride
  *      through the band shuffle).
  *
  * Evaluation-cost note: every stage below is a separate projection whose
  * input arrays are *materialized columns*. A non-trivial expression
  * referenced inside a higher-order-function lambda is re-evaluated per
  * array element, so folding these stages into one Column expression turns
  * the signature pass quadratic (measured 173 s → 4 s on 5k docs for this
  * exact pipeline). Multiple references to each staged column also stop
  * `CollapseProject` from re-inlining them.
  *
  * At 100 TB: steps 1-2 are embarrassingly parallel (per-row expressions);
  * the only shuffles are the (band,bucket) exchange (rows = docs × bands)
  * and the two id-keyed joins for verification, whose left side is only the
  * candidate pairs.
  */
object MinHashDedup {

  /** k-long sliding-window hashes over a *materialized* long-array column —
    * the interpreted HOF reference for [[graft.functions.ShingleHashes]]
    * (shape contract: arrays shorter than k collapse to one whole-array
    * hash). Kept for cross-checking; not on the hot path. */
  private[dedup] def windowHashesHof(th: Column, k: Int): Column =
    when(size(th) >= k,
      transform(sequence(lit(1), size(th) - (k - 1)),
        i => xxhash64(slice(th, i, lit(k)))))
      .otherwise(array(xxhash64(th)))

  /** (id, sh): distinct word-k-shingle hash sets, staged per the class note. */
  def shingleSets(docs: DataFrame, idCol: String, textCol: String,
                  k: Int): DataFrame =
    shingleSetsCarry(docs, idCol, textCol, k, Nil)

  /** [[shingleSets]] keeping `carry` passthrough columns (e.g. the event-time
    * column a streaming caller needs for its watermark). Tokenize + token
    * hash + window chain run as ONE native codegen pass per row
    * ([[graft.functions.ShingleHashes]]) — no interpreted lambdas, no
    * intermediate token-hash array. */
  def shingleSetsCarry(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, carry: Seq[String]): DataFrame =
    docs
      .select(col(idCol).as("id") +: carry.map(col) :+
        array_distinct(graft.functions.ShingleHashes(docs.sparkSession,
          TextFunctions.tokens(col(textCol)), k)).as("sh"): _*)

  /** MinHash signature of a *materialized* shingle-hash array column:
    * element i = min over shingle hashes s of XXH64.hashLong(s, seed=i) —
    * the native one-pass codegen expression
    * [[graft.functions.MinHashSignature]]. */
  def minhashSignature(spark: org.apache.spark.sql.SparkSession,
                       sh: Column, numHashes: Int): Column =
    graft.functions.MinHashSignature(spark, sh, numHashes)

  /** Higher-order-function formulation of the same signature math (numHashes
    * interpreted passes) — kept as the cross-check reference for
    * [[graft.functions.MinHashSignature]] in DedupSpec; not on the hot
    * path. NOTE: not byte-identical to the native expression (the xxhash64
    * SQL function chains from a fixed seed rather than seeding per index),
    * so compare structure/recall, not raw values. */
  def minhashSignatureHof(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  /** (id, band, bucket) rows from an (id, sh) sets frame. */
  private def bandedFromSets(sets: DataFrame, numHashes: Int,
                             bands: Int): DataFrame =
    bandedFromSetsCarry(sets, numHashes, bands, Nil)

  /** (id, carry..., band, bucket) rows from an (id, carry..., sh) sets frame
    * — `bands` rows per input row, one per LSH band. Public so the streaming
    * near-dup suppressor shares the exact banding math with the batch path. */
  def bandedFromSetsCarry(sets: DataFrame, numHashes: Int, bands: Int,
                          carry: Seq[String]): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val r = numHashes / bands
    sets
      .select(col("id") +: carry.map(col) :+
        minhashSignature(sets.sparkSession, col("sh"), numHashes).as("sig"): _*)
      .select(col("id") +: carry.map(col) :+
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * lit(r) + 1, lit(r))))): _*)
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
  }

  /** Candidate pairs (id_a < id_b) sharing at least one LSH bucket. */
  def candidatePairsFromSets(sets: DataFrame, numHashes: Int = 16,
                             bands: Int = 4): DataFrame = {
    val b = bandedFromSets(sets, numHashes, bands)
    b.as("l").join(b.as("r"),
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
  }

  /** Candidate pairs straight from a text column. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
                     k: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame =
    candidatePairsFromSets(shingleSets(docs, idCol, textCol, k), numHashes, bands)

  /** Shared verification tail for candidate-pair generators: join the
    * (id, sh) sets back onto (id_a, id_b) pairs and keep exact Jaccard ≥
    * threshold (exact modulo 64-bit hash collisions). One definition so the
    * MinHash and n-gram paths can't drift apart.
    *
    * `sorted = true` (caller-asserted: every `sh` is sorted ascending,
    * distinct — the `array_sort(array_distinct(...))` staging the n-gram /
    * containment paths already do) swaps the per-pair
    * `array_intersect`/`array_union` set builds for one
    * [[graft.functions.SortedIntersectCount]] merge walk, with the union
    * size by inclusion–exclusion. The Jaccard double is the SAME
    * correctly-rounded int/int division either way (identical numerator
    * and denominator on distinct arrays), so results are bit-identical —
    * only the per-pair allocation disappears. The MinHash paths keep the
    * generic form: their sets frames are first-occurrence-ordered, and the
    * persisted corpus-set index contract ([[incrementalNearDups]])
    * predates this expression. */
  private[graft] def verifyJaccard(pairs: DataFrame, sets: DataFrame,
                                   threshold: Double,
                                   sorted: Boolean = false): DataFrame = {
    val inter =
      if (sorted)
        graft.functions.SortedIntersectCount
          .columnOf(col("sh_a"), col("sh_b"))
      else size(array_intersect(col("sh_a"), col("sh_b")))
    val union =
      if (sorted) size(col("sh_a")) + size(col("sh_b")) - inter
      else size(array_union(col("sh_a"), col("sh_b")))
    pairs
      .join(sets.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", inter.cast("double") / union.cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Near-duplicate pairs with exact-Jaccard verification ≥ threshold. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
                     threshold: Double, k: Int = 3, numHashes: Int = 16,
                     bands: Int = 4): DataFrame = {
    // shingle sets feed signature banding AND both verification joins —
    // persist the diamond's shared input once (see NGramJaccard note)
    val sh = graft.Guards.materialize(shingleSets(docs, idCol, textCol, k))
    verifyJaccard(candidatePairsFromSets(sh, numHashes, bands), sh, threshold)
  }

  /** (id, band, bucket) LSH index rows for an (id, sh) sets frame — the
    * persisted form of a corpus for [[incrementalNearDups]]. Written once at
    * corpus build, appended per ingest; incremental dedup then never
    * re-shingles (or even re-reads) historical text. */
  def bandIndex(sets: DataFrame, numHashes: Int = 16,
                bands: Int = 4): DataFrame =
    bandedFromSets(sets, numHashes, bands)

  /** Incremental near-dup detection: today's ingest against an
    * already-indexed corpus, without reprocessing the corpus.
    *
    * The historical corpus participates ONLY through its two persisted
    * index tables — `corpusBands` (id, band, bucket), built by
    * [[bandIndex]], and `corpusSets` (id, sh), built by [[shingleSets]] —
    * so the 100 TB of historical text is never re-read, let alone
    * re-shingled. Join strategy is sized to the asymmetry: the increment's
    * band rows BROADCAST onto the corpus index scan (a daily batch is tiny
    * against the corpus — the index is probed in place, never shuffled),
    * and the resulting candidate id pairs — bounded by true near-dups plus
    * LSH collisions, not corpus size — drive a broadcast semi-probe of
    * `corpusSets` for exact-Jaccard confirmation. Within-increment pairs
    * are found by the ordinary self-join path on the increment alone.
    *
    * Output: (new_id, dup_id, jaccard) — `dup_id` an indexed corpus doc or
    * an earlier (lower-id) doc of the same increment. Contract: ids are
    * globally unique across corpus and increment, and the index was built
    * with the same (k, numHashes, bands).
    */
  def incrementalNearDups(newDocs: DataFrame, idCol: String, textCol: String,
                          corpusBands: DataFrame, corpusSets: DataFrame,
                          threshold: Double, k: Int = 3, numHashes: Int = 16,
                          bands: Int = 4): DataFrame = {
    val newSets = graft.Guards.materialize(
      shingleSets(newDocs, idCol, textCol, k))
    val newBands = bandedFromSets(newSets, numHashes, bands)
      .withColumnRenamed("id", "new_id")
    val cross = corpusBands
      .join(broadcast(newBands), Seq("band", "bucket"))
      .select(col("id").as("id_a"), col("new_id").as("id_b"))
      .distinct()
    val within = candidatePairsFromSets(newSets, numHashes, bands)
    // confirm against the union of set sources: candidates broadcast, so
    // the corpus set index is scanned once and filtered in place
    val pairs = broadcast(cross.union(within))
    verifyJaccard(pairs, corpusSets.select("id", "sh").union(newSets),
      threshold)
      .select(col("id_b").as("new_id"), col("id_a").as("dup_id"),
        col("jaccard"))
  }
}
