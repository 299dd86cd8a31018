package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native Catalyst expression: membership probe against a Bloom-filter
  * bitset carried in the plan as a foldable `array<long>` literal.
  *
  * `bloom_contains(h, bits, k)` probes `k` positions of the bitset derived
  * from the 64-bit hash `h` by Kirsch–Mitzenmacher double hashing:
  * `pos_i = (h + i·δ) mod m` with `δ = rotl(h, 31) | 1` (odd, so the probe
  * stride is invertible mod 2⁶⁴) and `m = 64·bits.length`. No false
  * negatives for hashes inserted via [[BloomFilterSet.add]] (identical
  * probe positions); false-positive rate ≈ (1 − e^(−k·n/m))^k, ~0.05% at
  * 16 bits/item with k = 11.
  *
  * Why a plan literal and not a broadcast variable: Spark broadcasts each
  * stage's serialized task binary exactly once per executor, so a bitset
  * embedded in the plan already rides the efficient path — with none of the
  * UDF/closure machinery that would take the probe out of whole-stage
  * codegen. The probe itself is k dependent loads against a long[] the JIT
  * keeps hot — the reason Spark's own runtime row-group filtering
  * (`InjectRuntimeFilter`) uses the same construction internally.
  */
case class BloomContains(left: Expression, right: Expression, numHashes: Int)
  extends BinaryExpression {

  require(numHashes >= 1 && numHashes <= 64,
    "bloom_contains: numHashes must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_contains: the bitset argument must be foldable (a literal)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains requires (bigint, array<bigint>), got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  // the bitset is foldable by contract — materialize the long[] ONCE, not
  // per row (ArrayData.toLongArray copies)
  @transient private lazy val bits: Array[Long] =
    right.eval(null).asInstanceOf[ArrayData].toLongArray()

  override def nullSafeEval(l: Any, r: Any): Any =
    BloomFilterSet.mightContain(bits, l.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, _) => {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
      val m = bits.length.toLong * 64L
      val idx = ctx.freshName("idx")
      val delta = ctx.freshName("delta")
      val pos = ctx.freshName("pos")
      val hit = ctx.freshName("hit")
      val i = ctx.freshName("i")
      s"""
         |long $idx = $h;
         |long $delta = (Long.rotateLeft($h, 31) | 1L);
         |boolean $hit = true;
         |for (int $i = 0; $i < $numHashes; $i++) {
         |  long $pos = ($idx & Long.MAX_VALUE) % ${m}L;
         |  if (($bitsRef[(int) ($pos >>> 6)] & (1L << $pos)) == 0L) {
         |    $hit = false;
         |    break;
         |  }
         |  $idx += $delta;
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomContains {
  /** Column-API entry point (register-and-call, same pattern as
    * [[DotProduct]]). The bitset ships as an `array<long>` literal. */
  def apply(spark: org.apache.spark.sql.SparkSession,
            hash: org.apache.spark.sql.Column,
            bits: Array[Long], numHashes: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("bloom_contains", hash,
      org.apache.spark.sql.functions.lit(bits),
      org.apache.spark.sql.functions.lit(numHashes))
  }
}

/** Driver-side bitset construction sharing [[BloomContains]]'s probe
  * positions exactly (same double-hashing recurrence), so membership has no
  * false negatives by construction. */
object BloomFilterSet {

  /** k ≈ bitsPerItem·ln2 minimizes the false-positive rate for a given
    * bits-per-item budget. */
  def optimalNumHashes(bitsPerItem: Int): Int =
    math.max(1, math.round(bitsPerItem * math.log(2.0)).toInt)

  /** Bitset sized to `bitsPerItem` bits per distinct item, rounded up to a
    * whole number of words; (bits, numHashes). */
  def build(hashes: Array[Long], bitsPerItem: Int = 16): (Array[Long], Int) = {
    require(bitsPerItem >= 1 && bitsPerItem <= 64,
      s"bitsPerItem must be in [1, 64], got $bitsPerItem")
    val nWords = math.max(1L, (hashes.length.toLong * bitsPerItem + 63) / 64)
    require(nWords <= Int.MaxValue / 8, "bitset would exceed 2^31 words")
    val bits = new Array[Long](nWords.toInt)
    val k = optimalNumHashes(bitsPerItem)
    hashes.foreach(add(bits, _, k))
    (bits, k)
  }

  /** Set the k probe positions of `h` (mutates `bits`). */
  def add(bits: Array[Long], h: Long, k: Int): Unit = {
    val m = bits.length.toLong * 64L
    var idx = h
    val delta = java.lang.Long.rotateLeft(h, 31) | 1L
    var i = 0
    while (i < k) {
      val pos = (idx & Long.MaxValue) % m
      bits((pos >>> 6).toInt) |= (1L << pos)
      idx += delta
      i += 1
    }
  }

  /** Interpreted twin of the codegen probe loop. */
  def mightContain(bits: Array[Long], h: Long, k: Int): Boolean = {
    val m = bits.length.toLong * 64L
    var idx = h
    val delta = java.lang.Long.rotateLeft(h, 31) | 1L
    var i = 0
    while (i < k) {
      val pos = (idx & Long.MaxValue) % m
      if ((bits((pos >>> 6).toInt) & (1L << pos)) == 0L) return false
      idx += delta
      i += 1
    }
    true
  }
}
