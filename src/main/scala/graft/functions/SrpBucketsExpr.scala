package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression: ALL `nTables` SRP bucket ids of a vector in
  * ONE primitive loop — `srp_buckets(v)[t] = Σ_p (v̂·plane_{t,p} ≥ 0) · 2^p`
  * with table `t`'s planes drawn from `Random(seed + t).nextGaussian()` in
  * plane-major order, exactly the [[graft.similarity.Ann.srpBucket]]
  * recurrence (AnnSpec/AdversarialPropertySpec5 value-pin the stream).
  *
  * Exists because the compositional formulation — per table a sum of
  * `bits` separate `when(vec_dot(v, planeLiteral) ≥ 0, 2^p, 0)` sub-trees,
  * 17 tables × 9 planes = 153 independent DotProduct trees in one
  * projection — overflows whole-stage codegen's method budget and drops
  * the hottest ANN stage to interpreted eval: at sf1u the q19 bucket pass
  * measured 20 s of a 25 s query. Here the plane matrix rides along as ONE
  * flat double[] reference (driver-computed, identical on every executor)
  * and the whole signature is tables×bits×dim fused multiply-adds per row
  * inside codegen.
  *
  * Null semantics replicate the old tree exactly: a null vector, a
  * length-mismatched vector, or any null element made every
  * `when(null ≥ 0, …)` fall to its `otherwise(0)` — bucket 0 in every
  * table — so this expression returns all-zero buckets (never null) in
  * those cases and is therefore non-null-propagating by design.
  */
case class SrpBuckets(child: Expression, nTables: Int, bits: Int,
                      dim: Int, seed: Long) extends UnaryExpression {

  require(nTables >= 1 && bits >= 1 && bits <= 30 && dim >= 1,
    s"srp_buckets out of range: nTables=$nTables bits=$bits dim=$dim")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets requires array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "srp_buckets"

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val planesFlat: Array[Double] =
    SrpBuckets.planes(nTables, bits, dim, seed)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) new GenericArrayData(new Array[Int](nTables))
    else SrpBuckets.compute(v.asInstanceOf[ArrayData], planesFlat,
      nTables, bits, dim, isFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val planesRef = ctx.addReferenceObj("srpPlanes", planesFlat, "double[]")
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code +
      code"""
         |org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} =
         |  ${childGen.isNull}
         |    ? new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[$nTables])
         |    : graft.functions.SrpBuckets.compute(
         |        ${childGen.value}, $planesRef, $nTables, $bits, $dim, $isFloat);
       """.stripMargin, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBuckets {

  /** Flat plane matrix [t·bits·dim + p·dim + d]: table t's planes are
    * `Random(seed + t).nextGaussian()` in plane-major order — the exact
    * [[graft.similarity.Ann]] stream the replays pin. */
  def planes(nTables: Int, bits: Int, dim: Int, seed: Long): Array[Double] = {
    val out = new Array[Double](nTables * bits * dim)
    var t = 0
    while (t < nTables) {
      val rnd = new scala.util.Random(seed + t)
      var i = 0
      while (i < bits * dim) {
        out(t * bits * dim + i) = rnd.nextGaussian(); i += 1
      }
      t += 1
    }
    out
  }

  /** Static codegen/eval body: one fused loop over tables × planes × dim.
    * The per-plane accumulation (`s += v(d) · plane(d)` ascending, floats
    * widened before the multiply) is bit-identical to
    * [[DotProduct]]'s loop, and the `≥ 0` sign test to the old
    * `when(dot ≥ 0, 2^p)` tree. A length mismatch or a null element
    * yields all-zero buckets (the old tree's null-to-otherwise path). */
  def compute(v: ArrayData, planes: Array[Double], nTables: Int, bits: Int,
              dim: Int, isFloat: Boolean): GenericArrayData = {
    val out = new Array[Int](nTables)
    if (v.numElements() != dim) return new GenericArrayData(out)
    var d = 0
    while (d < dim) {
      if (v.isNullAt(d)) return new GenericArrayData(out)
      d += 1
    }
    val vd = new Array[Double](dim)
    if (isFloat) {
      var i = 0
      while (i < dim) { vd(i) = v.getFloat(i).toDouble; i += 1 }
    } else {
      var i = 0
      while (i < dim) { vd(i) = v.getDouble(i); i += 1 }
    }
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var p = 0
      while (p < bits) {
        val base = (t * bits + p) * dim
        var s = 0.0
        var i = 0
        while (i < dim) { s += vd(i) * planes(base + i); i += 1 }
        if (s >= 0) bucket |= 1 << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Session-free Column entry point (the [[PolyHash.columnOf]] pattern). */
  def columnOf(vec: org.apache.spark.sql.Column, nTables: Int, bits: Int,
               dim: Int, seed: Long): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      SrpBuckets(GraftColumnBridge.expression(vec), nTables, bits, dim, seed))
  }
}
