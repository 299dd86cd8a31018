package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: one-pass MinHash signature of a shingle-hash
  * array.
  *
  * `minhash_sig(sh, n)[i] = min over s in sh of XXH64.hashLong(s, seed=i)`.
  *
  * Why a custom expression instead of composing `transform`/`array_min`
  * (graft's original formulation, kept as
  * [[graft.dedup.MinHashDedup.minhashSignatureHof]] for cross-checking):
  * higher-order functions evaluate their lambdas interpreted — `numHashes`
  * separate passes over the array with per-element boxing. This expression
  * computes all `numHashes` minima in ONE pass over the raw `ArrayData`
  * inside whole-stage codegen: zero allocation per element, primitive longs
  * throughout. Same asymptotics, ~an order of magnitude less constant
  * factor on the hottest loop of 100 TB dedup.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashLong(s, j.toLong)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val h = ctx.freshName("h")
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $s = $c.getLong($i);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($s, (long) $j);
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {
  /** Column-API entry point: registers the function on the session (public
    * FunctionRegistry API, idempotent) and calls it by name — the supported
    * way to get a custom Expression into a Column without touching
    * `private[sql]` constructors. */
  def apply(spark: org.apache.spark.sql.SparkSession,
            sh: org.apache.spark.sql.Column, numHashes: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("minhash_sig", sh,
      org.apache.spark.sql.functions.lit(numHashes))
  }
}
