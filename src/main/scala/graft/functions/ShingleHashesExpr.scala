package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit hashes of all word k-shingles of a
  * token array, in ONE pass.
  *
  * `shingle_hashes(tokens, k)[i] = H(tokens[i..i+k-1])` where each token is
  * XXH64-hashed once and a window's hash chains its token hashes
  * (`h = xxh64_long(th[j], h)`, seeded 42). Arrays shorter than k collapse
  * to one whole-array hash — the same shape contract as the
  * `transform(sequence(...), i => xxhash64(slice(th, i, k)))` higher-order
  * formulation it replaces (hash VALUES differ; only within-pipeline
  * consistency matters, and DedupSpec's Jaccard assertions are
  * value-independent).
  *
  * Why: shingling is the per-row front door of MinHash AND n-gram Jaccard
  * dedup — every document pays tokens + windows hash evaluations. The HOF
  * formulation runs two interpreted lambda passes (token-hash transform,
  * then a slice allocation + full array-hash eval per window) with
  * per-element boxing; this expression does token hashing and window
  * chaining in one primitive whole-stage-codegen loop with a single
  * `long[]` scratch buffer. Null tokens are skipped within their window
  * (token arrays from `split` never carry nulls).
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "shingle width k must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) =
        if (arr.isNullAt(i)) 0L
        else {
          val s = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        }
      i += 1
    }
    if (n >= k) {
      val out = new Array[Long](n - k + 1)
      var w = 0
      while (w <= n - k) {
        var h = 42L
        var j = 0
        while (j < k) { h = XXH64.hashLong(th(w + j), h); j += 1 }
        out(w) = h
        w += 1
      }
      new GenericArrayData(out)
    } else {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(th(j), h); j += 1 }
      new GenericArrayData(Array(h))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val th = ctx.freshName("th")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val out = ctx.freshName("out")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val j = ctx.freshName("j")
      s"""
         |int $n = $c.numElements();
         |long[] $th = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$c.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $c.getUTF8String($i);
         |    $th[$i] = $xxh.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |long[] $out;
         |if ($n >= $k) {
         |  $out = new long[$n - $k + 1];
         |  for (int $w = 0; $w <= $n - $k; $w++) {
         |    long $h = 42L;
         |    for (int $j = 0; $j < $k; $j++) {
         |      $h = $xxh.hashLong($th[$w + $j], $h);
         |    }
         |    $out[$w] = $h;
         |  }
         |} else {
         |  long $h = 42L;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $h = $xxh.hashLong($th[$j], $h);
         |  }
         |  $out = new long[] { $h };
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  /** Column-API entry point (register-and-call, same pattern as
    * [[MinHashSignature]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            tokens: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("shingle_hashes", tokens,
      org.apache.spark.sql.functions.lit(k))
  }
}
