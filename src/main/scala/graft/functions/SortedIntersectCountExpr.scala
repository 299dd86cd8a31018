package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression: `|A ∩ B|` of two ascending-sorted distinct
  * `array<bigint>` columns via a single merge walk.
  *
  * PRECONDITION (caller-enforced, spec-pinned at the call sites): both
  * arrays are sorted ascending with distinct elements — exactly the shape
  * the dedup verification frames stage (`array_sort(array_distinct(...))`
  * over shingle hashes). On that shape the count equals
  * `size(array_intersect(a, b))`; on unsorted input the walk's result is
  * meaningless, which is why the sites that hold unsorted sets (the
  * persisted MinHash corpus-set index contract predates this expression)
  * keep the generic `array_intersect` form.
  *
  * Why it exists: exact-verification joins evaluate one intersection per
  * CANDIDATE PAIR — millions of rows at bench scale, corpus × near-dup
  * rate at 100 TB. `size(array_intersect(...))` builds an OpenHashSet
  * over one side and materializes the intersection as a fresh array per
  * pair, only for `size` to reduce it to an int; `array_union` in the
  * Jaccard form repeats the set build a second time. The merge walk is
  * two pointer increments per element, no per-pair allocation, and stays
  * inside whole-stage codegen. Union sizes come free by
  * inclusion–exclusion (`|A ∪ B| = |A| + |B| − |A ∩ B|` — exact on
  * distinct arrays), so one walk replaces both set builds.
  *
  * Null semantics (the [[DotProduct]] convention): null if either input
  * is null or — when the schema admits null elements — a null element is
  * encountered before the walk completes.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint>, got " +
          s"${l.simpleString}, ${r.simpleString}")
    }

  override def dataType: DataType = IntegerType
  // null also on null element, not only on null input
  override def nullable: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i) || b.isNullAt(j)) return null
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // skip per-element null checks when the schema guarantees none
      def nullCheck(arr: String, i: String, e: Expression) =
        if (e.dataType.asInstanceOf[ArrayType].containsNull)
          s"if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  ${nullCheck(a, i, left)}
         |  ${nullCheck(b, j, right)}
         |  long $x = $a.getLong($i);
         |  long $y = $b.getLong($j);
         |  if ($x < $y) { $i++; }
         |  else if ($x > $y) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Session-free Column entry point (the [[PolyHash.columnOf]] pattern). */
  def columnOf(a: org.apache.spark.sql.Column,
               b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
