package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash of a token-hash array
  * (Charikar '02 — bit b of the fingerprint is set iff more than half the
  * token hashes have bit b set).
  *
  * `simhash64(th)` computes all 64 bit tallies in ONE pass over the raw
  * `ArrayData` inside whole-stage codegen. This replaces the aggregation
  * formulation (explode tokens → 64 `sum(getbit)` partial aggs → fold),
  * which is shuffle-efficient but still *a shuffle*: per-row evaluation
  * makes signature construction embarrassingly parallel — zero exchanges,
  * which is the shape you want feeding 100 TB of documents through
  * near-dup detection. (The aggregation formulation is kept as
  * [[graft.dedup.SimHash.signaturesAgg]] and cross-checked in DedupSpec;
  * the interpreted HOF reference is [[graft.dedup.SimHash.simhash64]].)
  *
  * Null array → null; null elements are skipped (token hashes produced by
  * `xxhash64` are never null, but a hand-built array might carry them);
  * empty array → 0L (no votes set no bits).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val ones = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          ones(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        n += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (ones(b) * 2 > n) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ones = ctx.freshName("ones")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $ones = new int[64];
         |int $n = 0;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = $c.getLong($i);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $ones[$b] += (int) (($h >>> $b) & 1L);
         |    }
         |    $n++;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($ones[$b] * 2 > $n) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-API entry point (register-and-call, same pattern as
    * [[MinHashSignature]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            th: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("simhash64", th)
  }
}
