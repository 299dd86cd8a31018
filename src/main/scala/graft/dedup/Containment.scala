package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Asymmetric containment detection — excerpt/quote near-dup, the case
  * symmetric Jaccard is BLIND to: a 200-word excerpt inside a 10k-word
  * article shares almost all of ITS n-grams with the article while the
  * pair's Jaccard is ~2% (union-normalized), so a Jaccard dedup keeps
  * both and the training set memorizes the passage twice. Containment
  * normalizes by the SMALLER set: c = |S_small ∩ S_big| / |S_small|.
  *
  * Candidate generation mirrors [[NGramJaccard]]'s prefix filter on the
  * CONTAINED side — a set with containment ≥ t must share one of its
  * first ⌊(1−t)·|S|⌋+1 globally-sorted shingles with its container
  * (lossless). The containing side has no partner-independent bound (a
  * tiny contained doc forces overlap T as low as ⌈t⌉, and the shared
  * gram can sit anywhere in the container's order), so BY DEFAULT the
  * container side is indexed in FULL — the honest lower bound for exact
  * containment, the same postings a search engine (row 125's BM25
  * index) already maintains. With a caller-declared noise floor
  * `minInGrams` (contained docs below it are not reported — the
  * excerpt-detection configuration, where sub-excerpt-length matches are
  * noise by definition), a container-side prefix DOES exist and is
  * applied: any qualifying pair has overlap T ≥ Tmin = ⌈t·minInGrams⌉,
  * and the smallest intersection gram e has ≤ n_of − T non-intersection
  * grams of the container below it, so e lies within the container's
  * first n_of − Tmin + 1 sorted grams — indexing only that prefix is
  * lossless for floored probes (ContainmentSpec pins floored ==
  * unfloored on qualifying docs). The hot-gram DF cap is the same
  * 100 TB outage guard as q18's (at default settings it never fires at
  * test scale, so the oracle needn't model it; misses are conservative
  * and stopword-like-grams-only).
  *
  * Orientation is deterministic: contained side = smaller distinct-gram
  * set, ties broken by id — so exact duplicates emit exactly one row.
  * Verification is exact set arithmetic over the full sorted hash
  * arrays, one int/int division per surviving pair.
  */
object Containment {

  /** Pairs (id_in, id_of, containment): id_in's distinct word-n-gram set
    * is ≥ `threshold` contained in id_of's, with |sh_in| < |sh_of| or
    * equal sizes and id_in < id_of. `minInGrams` (default 1 = exact,
    * every doc admissible) floors the CONTAINED side: docs with fewer
    * distinct grams are not reported, and the container index shrinks to
    * each doc's first n − ⌈threshold·minInGrams⌉ + 1 sorted grams (the
    * class-doc prefix lemma — lossless for floored probes). */
  def containedPairs(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, threshold: Double = 0.8,
                     maxDf: Int = 1000, minInGrams: Int = 1): DataFrame = {
    require(minInGrams >= 1, s"minInGrams must be >= 1, got $minInGrams")
    // sets feed the probe, the full index, and both verification joins —
    // materialize the diamond once, eagerly (Guards.materialize: a lazy
    // persist was raced into recomputes by concurrent AQE stage jobs)
    val sets = graft.Guards.materialize(
      NGramJaccard.shingleSets(docs, idCol, textCol, n)
        .select(col("id"), array_sort(col("sh")).as("sh")))
    val prefixLen = (size(col("sh")) - ceil(lit(threshold) * size(col("sh")))
      + 1).cast("int")
    val probe = sets.filter(size(col("sh")) >= minInGrams)
      .select(col("id"), size(col("sh")).as("n"),
        explode(slice(col("sh"), lit(1), prefixLen)).as("g"))
    // Tmin = ⌈t·minInGrams⌉ ≤ minInGrams, and any candidate container
    // has n ≥ its partner's n ≥ minInGrams, so the prefix length
    // n − Tmin + 1 is ≥ 1 on every admissible container; sub-floor docs
    // are dropped from the index outright (they can only contain
    // sub-floor probes, which the floor excludes)
    val tMin = math.ceil(threshold * minInGrams).toInt.max(1)
    val full = sets.filter(size(col("sh")) >= minInGrams)
      .select(col("id"), size(col("sh")).as("n"),
        explode(slice(col("sh"), lit(1),
          (size(col("sh")) - lit(tMin) + 1).cast("int"))).as("g"))
    val hot = full.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select("g")
    // probe and full share lineage from `sets`; distinct column names
    // (not dataset aliases) keep the self-join resolution unambiguous
    val fullCold = full.join(broadcast(hot), Seq("g"), "left_anti")
      .select(col("id").as("id_of"), col("n").as("n_of"),
        col("g").as("g_of"))
    val probeCold = probe.join(broadcast(hot), Seq("g"), "left_anti")
      .select(col("id").as("id_in"), col("n").as("n_in"), col("g"))
    val pairs = probeCold.join(fullCold,
        col("g") === col("g_of") && (col("n_in") < col("n_of") ||
          (col("n_in") === col("n_of") && col("id_in") < col("id_of"))))
      .select(col("id_in"), col("id_of"))
      .distinct()
    pairs
      .join(sets.select(col("id").as("id_in"), col("sh").as("sh_in")), "id_in")
      .join(sets.select(col("id").as("id_of"), col("sh").as("sh_of")), "id_of")
      // both sides array_sorted above — native merge walk, no per-pair
      // set build (same int numerator, bit-identical containment double)
      .withColumn("containment",
        graft.functions.SortedIntersectCount
          .columnOf(col("sh_in"), col("sh_of")).cast("double") /
          size(col("sh_in")).cast("double"))
      .filter(col("containment") >= threshold)
      .select("id_in", "id_of", "containment")
  }

  /** Sorted distinct-gram sets (id, sh) of a corpus — the verification
    * half of the persisted container index ([[containedAgainstIndex]]).
    * Persist next to the corpus; tomorrow's ingest never re-shingles
    * history. */
  def containerSets(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3): DataFrame =
    NGramJaccard.shingleSets(docs, idCol, textCol, n)
      .select(col("id"), array_sort(col("sh")).as("sh"))

  /** Candidate-generation half of the persisted container index:
    * (id, n, g) postings over each doc's first
    * n − ⌈threshold·minInGrams⌉ + 1 sorted grams (the class-doc prefix
    * lemma — lossless for probes of ≥ minInGrams grams). Containers with
    * fewer than ⌈threshold·minInGrams⌉ grams cannot contain any floored
    * probe (|∩| ≥ ⌈t·minInGrams⌉ > n_of would be required) and are
    * dropped outright. */
  def containerPostings(sets: DataFrame, threshold: Double = 0.8,
                        minInGrams: Int = 1): DataFrame = {
    require(minInGrams >= 1, s"minInGrams must be >= 1, got $minInGrams")
    val tMin = math.ceil(threshold * minInGrams).toInt.max(1)
    sets.filter(size(col("sh")) >= tMin)
      .select(col("id"), size(col("sh")).as("n"),
        explode(slice(col("sh"), lit(1),
          (size(col("sh")) - lit(tMin) + 1).cast("int"))).as("g"))
  }

  /** Incremental containment screen — the containment cell of the
    * incremental-ingest matrix (rows 58/73/99/107/126 for the other
    * signature families): which ARRIVING docs are ≥ `threshold`
    * contained in some doc of the persisted index. Roles are fixed (new
    * = contained, indexed = container) — a new doc that merely contains
    * an old one is NOT flagged; that direction is yesterday's screen,
    * already run when the old corpus was built.
    *
    * Scale shape: the increment's prefix grams BROADCAST onto the
    * postings scan (history never re-shingles, never shuffles);
    * verification joins the bounded candidate set against the persisted
    * sorted sets. No hot-gram cap here by design: the probe side is
    * increment-sized, so the q18-style DF outage mode (corpus × corpus
    * hot gram) cannot arise. */
  def containedAgainstIndex(newDocs: DataFrame, idCol: String,
                            textCol: String, postings: DataFrame,
                            sets: DataFrame, n: Int = 3,
                            threshold: Double = 0.8,
                            minInGrams: Int = 1): DataFrame = {
    require(minInGrams >= 1, s"minInGrams must be >= 1, got $minInGrams")
    val newSets = graft.Guards.materialize(
      containerSets(newDocs, idCol, textCol, n))
    val prefixLen = (size(col("sh")) - ceil(lit(threshold) * size(col("sh")))
      + 1).cast("int")
    val probe = newSets.filter(size(col("sh")) >= minInGrams)
      .select(col("id").as("id_in"),
        explode(slice(col("sh"), lit(1), prefixLen)).as("g"))
    val cand = postings.join(broadcast(probe), Seq("g"))
      .select(col("id").as("id_of"), col("id_in")).distinct()
    cand
      // `sets` is caller-supplied: the [[containerSets]] contract says
      // sorted, but the merge-walk verification is silently WRONG on
      // unsorted arrays — re-sort defensively (no-op cost on sorted
      // input, and only candidate containers pay it, not the corpus)
      .join(sets.select(col("id").as("id_of"),
          array_sort(col("sh")).as("sh_of")),
        "id_of")
      .join(newSets.select(col("id").as("id_in"), col("sh").as("sh_in")),
        "id_in")
      .withColumn("containment",
        graft.functions.SortedIntersectCount
          .columnOf(col("sh_in"), col("sh_of")).cast("double") /
          size(col("sh_in")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("id_in").as("new_id"), col("id_of").as("container_id"),
        col("containment"))
  }

  /** The scrub: (id, kept, contained_in) for every input row — kept = 0
    * iff the doc is ≥ `threshold` contained in some larger doc, with the
    * smallest such container as evidence (NULL for keepers). Dropping
    * every contained doc — even when its container is itself contained
    * elsewhere — is the standard one-pass rule: orientation is acyclic
    * (strictly-larger set, id tiebreak), so the maximal container of any
    * chain is never contained and always survives; the content is kept
    * exactly once. */
  def scrubContained(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 3, threshold: Double = 0.8,
                     maxDf: Int = 1000, minInGrams: Int = 1): DataFrame = {
    val drops = containedPairs(docs, idCol, textCol, n, threshold, maxDf,
      minInGrams)
      .groupBy("id_in").agg(min("id_of").as("contained_in"))
      .withColumnRenamed("id_in", "id")
    docs.select(col(idCol).as("id"))
      .join(drops, Seq("id"), "left")
      .select(col("id"),
        when(col("contained_in").isNull, 1L).otherwise(0L).as("kept"),
        col("contained_in"))
  }
}
