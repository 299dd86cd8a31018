package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit hashes of all CHARACTER n-gram
  * windows of a string, in one pass — the char-level sibling of
  * [[ShingleHashes]] (word shingles).
  *
  * `char_gram_hashes(text, n)[i] = XXH64(bytes of text[i..i+n-1], 42)`
  * where indices are CODE POINTS (so multi-byte UTF-8 text windows
  * correctly — the same character semantics as `substr`). Strings shorter
  * than n collapse to one whole-string hash, mirroring the
  * `transform(sequence(1, len-(n-1)), i -> substr(text, i, n))`
  * formulation this replaces in
  * [[graft.textstats.Repetition.topCharNgramStats]]: same array SHAPE
  * (len−n+1 windows, or exactly one), hash values instead of substrings.
  *
  * Why: Gopher-style char-repetition scoring enumerates every n-char
  * window of every document. The `substr` formulation allocates a fresh
  * UTF8String per window inside two interpreted higher-order lambdas
  * (O(len·n) bytes COPIED per row), then ships 4-char strings through the
  * explode/groupBy shuffle. This expression walks the code-point index
  * once and hashes each window's bytes in place (no allocation beyond the
  * output array), and downstream counting groups by 8-byte longs instead
  * of strings. Counting hashes instead of grams changes the mode count
  * only on a within-document XXH64 collision (P ≈ pairs·2⁻⁶⁴ — vanishing
  * at document scale, and RepetitionSpec cross-checks against the substr
  * formulation on real corpus text).
  */
case class CharGramHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "char-gram width n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    CharGramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharGramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharGramHashes {

  /** Static codegen entry point (also the interpreted eval body): walk the
    * UTF-8 byte stream once to index code-point starts, then hash each
    * n-code-point window's bytes in place. */
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes
    // code-point start offsets (relative): starts(i) = byte offset of the
    // i-th code point; starts(len) = numBytes sentinel
    var len = 0
    var p = 0
    val starts = new Array[Int](nb + 1)
    while (p < nb) {
      starts(len) = p
      p += UTF8String.numBytesForFirstByte(s.getByte(p))
      len += 1
    }
    starts(len) = nb
    if (len >= n) {
      val out = new Array[Long](len - n + 1)
      var w = 0
      while (w <= len - n) {
        val b0 = starts(w)
        out(w) = XXH64.hashUnsafeBytes(base, off + b0, starts(w + n) - b0, 42L)
        w += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array(XXH64.hashUnsafeBytes(base, off, nb, 42L)))
    }
  }

  /** Column-API entry point (register-and-call, same pattern as
    * [[ShingleHashes]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("char_gram_hashes", text,
      org.apache.spark.sql.functions.lit(n))
  }
}
