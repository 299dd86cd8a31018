package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (Cormode & Muthukrishnan) as a typed Aggregator over
  * pre-hashed 64-bit keys: d rows × w counters; each key increments one
  * counter per row at position xxh64(key, row) mod w, and a point estimate
  * is the MINIMUM of its d counters — an overestimate by at most εN with
  * probability 1−δ (ε = e/w, δ = e^−d). The heavy-hitter primitive when
  * exact per-key counts would make the key space itself the shuffle (token
  * frequencies over 100 TB, hot-key diagnosis before a salted join): the
  * sketch is a FIXED d·w·8 bytes regardless of key cardinality.
  *
  * Everything is deterministic and partitioning-invariant by construction:
  * cells are sums of per-key increments (addition commutes, merge is
  * element-wise sum), and the row hash is seeded xxhash64 — the same
  * function the plan-side `xxhash64()` column computes, so callers hash
  * keys in codegen and feed this aggregator longs. Map-side partial
  * aggregation ships ONE sketch per partition, never the keys.
  */
class CountMinAggregator(d: Int, w: Int)
  extends Aggregator[Long, Array[Long], Array[Long]] {

  require(d >= 1 && d <= 16, s"depth must be in [1, 16], got $d")
  require(w >= 16, s"width must be >= 16, got $w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], keyHash: Long): Array[Long] = {
    var r = 0
    while (r < d) {
      buf(r * w + CountMinSketch.cell(keyHash, r, w)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object CountMinSketch {

  /** Row-r cell of a key hash: an independent-per-row position derived by
    * re-hashing with the row index as the xxh64 seed (the minhash_sig
    * recurrence), folded to [0, w). */
  def cell(keyHash: Long, r: Int, w: Int): Int = {
    val h = XXH64.hashLong(keyHash, r.toLong)
    (((h % w) + w) % w).toInt
  }

  /** Point estimate: min over the d row counters. Never under the true
    * count; over by at most εN w.h.p. */
  def estimate(sketch: Array[Long], keyHash: Long, d: Int, w: Int): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = sketch(r * w + cell(keyHash, r, w))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Seed-42 xxhash64 of a string's UTF-8 bytes — bit-identical to the
    * plan-side `xxhash64(col)` on a string column, so driver-side probes
    * address the same cells the codegen'd hashing filled. */
  def hashString(s: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes(), 42L)
  }
}
