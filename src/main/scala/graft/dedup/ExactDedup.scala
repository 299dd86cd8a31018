package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication.
  *
  * The reference uses `dropDuplicates()` (/root/reference/Yelp_Data_PreProcessing.py:77),
  * which keeps an *arbitrary* row per key — fine for its use but
  * non-deterministic. [[keepFirst]] is the deterministic form: one hash
  * shuffle partitioned by the dedup key, `row_number` within each key, keep
  * rank 1. At 100 TB this is a single exchange on the key (no sort of the
  * whole relation, only within key groups), and AQE handles skewed keys.
  */
object ExactDedup {

  /** Deterministic dedup: keep the row with the smallest `orderCol` per key. */
  def keepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** [[keepFirst]] re-expressed as a `min_by` hash aggregation: keep the
    * whole row whose `orderCol` is smallest per key. Same result (when
    * `orderCol` is unique within each key and non-null — same determinism
    * contract as keepFirst), different — better — shuffle: partial (map-side)
    * aggregation reduces every partition to ONE candidate row per key before
    * the exchange, so the shuffle carries ≤ (distinct keys × partitions)
    * rows, versus keepFirst's window formulation which shuffles EVERY
    * duplicate row to its key's reducer before discarding it. At 100 TB with
    * a high duplicate rate this is the difference between shuffling the
    * distinct corpus and shuffling the whole corpus. */
  def keepFirstAgg(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val all = df.columns.toSeq
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(all.map(col): _*), col(orderCol)).as("__row"))
      .select(all.map(c => col("__row").getField(c).as(c)): _*)
  }

  /** Reference-faithful arbitrary-row dedup (ref Yelp_Data_PreProcessing.py:77). */
  def dropDups(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** Duplicate-group sizes for a key — handy dedup audit (hash-groupBy, one
    * shuffle carrying distinct keys only thanks to partial aggregation). */
  def dupCounts(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("dup_count"))
      .filter(col("dup_count") > 1)

  /** Duplication spectrum — the Lee et al. Fig-1 histogram "how many
    * texts occur exactly k times": size every exact-content group, then
    * count groups per size. The first question asked of any new crawl
    * (is it 2% duplicated or 40%?) and the before/after evidence for an
    * exact-dedup pass.
    *
    * Content identity is the portable q25 polynomial hash of `valueCol`
    * ([[graft.textstats.TextStats.fingerprintBase]]), so only LONGS
    * shuffle — never the text — and the SQL oracle replays the identical
    * spectrum. A hash collision merges two distinct texts into one group
    * (mod-1e9+7 space; birthday-bounded, and the oracle computes the
    * SAME hash so the comparison is still exact over the hash spectrum);
    * a production run at corpus scale would widen to a 128-bit hash, the
    * same plan shape. Two map-side-combined shuffles, both bounded by
    * distinct counts: (hash) then (group size). */
  def duplicationSpectrum(df: DataFrame, valueCol: String): DataFrame =
    df.select(graft.textstats.TextStats.fingerprintBase(col(valueCol), 31)
        .as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("copies"))
      .groupBy("copies").agg(count(lit(1)).as("n_texts"))

  /** Duplicate-count loss weighting — keep every copy but downweight it:
    * weight_bp = 10⁴ div n_copies, so a group of n duplicates carries
    * (approximately) one document's total weight. The alternative to
    * dropping duplicates when exact counts carry signal (popular
    * boilerplate IS popular) — the published middle ground between
    * keep-all and keep-one.
    *
    * Scale shape: documents group by their q25 polynomial fingerprint,
    * not raw text — only (id, int64) pairs shuffle (better than the raw
    * keepFirst move), at the q18/q84 hash-equality≈text-equality
    * collision odds, and the fingerprint is SQL-replayable so the
    * weights get an exact oracle. One map-side-combined count + one
    * co-partitioned join back. */
  def dupWeights(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keyed = df.select(col(idCol).as("id"),
      graft.textstats.TextStats.fingerprint(col(textCol)).as("__fp"))
    val counts = keyed.groupBy("__fp").agg(count(lit(1)).as("n_copies"))
    keyed.join(counts, "__fp")
      .select(col("id"), col("n_copies"),
        expr("10000 div n_copies").as("weight_bp"))
  }
}
