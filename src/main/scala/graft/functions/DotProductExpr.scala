package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, ShortType}

/** Native Catalyst expression: dot product of two numeric arrays.
  *
  * `vec_dot(u, v) = Σ uᵢ·vᵢ` (computed in double), null if either input is
  * null, the lengths differ, or any paired element is null — exactly the
  * semantics of the `aggregate(zip_with(...))` higher-order formulation in
  * [[VectorFunctions.dot]] (kept as the cross-check reference), but executed
  * as ONE primitive loop inside whole-stage codegen instead of `dim`
  * interpreted lambda invocations with per-element boxing. The dot product
  * is THE inner loop of every ANN/near-dup path (bucketing projections +
  * candidate verification are all dots), so the constant factor here
  * multiplies against corpus × candidates at 100 TB.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  // integral element types read directly (getByte/getShort/getInt) so the
  // int8-quantized ANN scan dots array<tinyint> without materializing a
  // cast array<double> copy per row per pair
  private def elemOk(dt: DataType) = dt == FloatType || dt == DoubleType ||
    dt == ByteType || dt == ShortType || dt == IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _)) if elemOk(lt) && elemOk(rt) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires two array<tinyint|smallint|int|float|double>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = DoubleType
  // null also on length mismatch / null element, not only on null input
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType

  // reader resolved ONCE per side (lazy val), not per element — the
  // interpreted path still runs the scoring loop when codegen is disabled
  // or falls back, and a per-element type dispatch there is 2·dim wasted
  // branches per pair
  private def reader(e: Expression): (ArrayData, Int) => Double =
    elemType(e) match {
      case FloatType => (a, i) => a.getFloat(i).toDouble
      case DoubleType => (a, i) => a.getDouble(i)
      case ByteType => (a, i) => a.getByte(i).toDouble
      case ShortType => (a, i) => a.getShort(i).toDouble
      case IntegerType => (a, i) => a.getInt(i).toDouble
    }
  @transient private lazy val readLeft = reader(left)
  @transient private lazy val readRight = reader(right)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += readLeft(a, i) * readRight(b, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(arr: String, i: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case DoubleType => s"$arr.getDouble($i)"
        case ByteType => s"(double) $arr.getByte($i)"
        case ShortType => s"(double) $arr.getShort($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
      }
      // skip per-element null checks when the schema guarantees none
      def nullCheck(arr: String, i: String, e: Expression) =
        if (e.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    ${nullCheck(a, i, left)}
         |    ${nullCheck(b, i, right)}
         |    $s += ${get(a, i, left)} * ${get(b, i, right)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-API entry point (register-and-call, same pattern as
    * [[MinHashSignature]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            u: org.apache.spark.sql.Column,
            v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot", u, v)
  }
}
