package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `bpe_encode(text, merges)` — apply a learned
  * byte-pair-encoding merge table (Sennrich et al. 2016) to a string and
  * return its subword tokens. The second argument is the rank-ordered merge
  * list as an `array<string>` LITERAL of `"left<U+0001>right"` entries (the
  * model ships inside the plan, broadcast with the task binary — no
  * side-channel lookup per row); ranks are parsed once per expression
  * instance, not per row.
  *
  * Semantics, identical to [[graft.textstats.Bpe.trainMerges]]'s counting
  * pass: the text is whitespace-split; each word starts as single-char
  * symbols; while any adjacent symbol pair is in the merge table, ALL
  * occurrences of the LOWEST-RANK such pair merge in one left-to-right
  * pass. Tokens of consecutive words concatenate in order, so
  * `concat(tokens of word)` always reassembles the word — the spec pins
  * that invariant. Normalization (lowercasing, trimming) is deliberately
  * NOT part of the expression: compose it in the plan so the tokenizer
  * stays a pure function of its input.
  *
  * Why native: the merge loop is per-row imperative work a UDF would pay
  * encoder/decoder boxing for; here both eval and whole-stage codegen call
  * one static method on the already-parsed rank map.
  */
case class BpeEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // a foldable-but-NULL merges literal (CAST(NULL AS ARRAY<STRING>))
      // would otherwise pass here and NPE when the lazy `ranks` is forced
      // at codegen time — reject it as an analysis error instead
      case (StringType, ArrayType(StringType, _))
          if right.foldable && right.eval(null) == null =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_encode merges must not be null")
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_encode merges must be a literal (the model is part of the plan)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode requires (string, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_encode"

  @transient private lazy val ranks: java.util.HashMap[String, Integer] =
    BpeEncode.parseRanks(right.eval(null).asInstanceOf[ArrayData])

  override def nullSafeEval(text: Any, merges: Any): Any =
    BpeEncode.encode(text.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks,
      classOf[java.util.HashMap[String, Integer]].getName)
    nullSafeCodeGen(ctx, ev, (t, _) =>
      s"${ev.value} = graft.functions.BpeEncode.encode($t, $ranksRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeEncode {

  /** Separator inside a merge-table entry; cannot occur in whitespace-split
    * symbols (it is not whitespace, and training strips nothing else). */
  val Sep: Char = '\u0001'

  def parseRanks(arr: ArrayData): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) {
      m.put(arr.getUTF8String(i).toString, Integer.valueOf(i))
      i += 1
    }
    m
  }

  /** Static codegen entry point (also the interpreted eval body). */
  def encode(text: UTF8String,
             ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val words = text.toString.split("\\s+")
    var wi = 0
    while (wi < words.length) {
      if (words(wi).nonEmpty) encodeWord(words(wi), ranks, out)
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Initial symbols: one per Unicode CODE POINT, not UTF-16 code unit —
    * splitting a surrogate pair would turn astral characters (emoji, rare
    * CJK) into lone surrogates that encode as '?', breaking the
    * reassembly invariant. Shared with [[graft.textstats.Bpe]] so train
    * and apply agree on the alphabet. */
  def codePointSymbols(w: String): scala.collection.mutable.ArrayBuffer[String] = {
    val syms = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var ci = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      syms += new String(Character.toChars(cp))
      ci += Character.charCount(cp)
    }
    syms
  }

  private def encodeWord(w: String,
                         ranks: java.util.HashMap[String, Integer],
                         out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    var syms = codePointSymbols(w)
    var done = syms.length <= 1
    while (!done) {
      // lowest-rank adjacent pair present in the table
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + Sep + syms(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) done = true
      else {
        // merge ALL occurrences of (bestA, bestB), left to right
        val ns = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            ns += bestA + bestB; j += 2
          } else { ns += syms(j); j += 1 }
        }
        syms = ns
        done = syms.length <= 1
      }
    }
    var k = 0
    while (k < syms.length) {
      out += UTF8String.fromString(syms(k)); k += 1
    }
  }

  /** Column-API entry point (register-and-call, same pattern as
    * [[DeflateLen]]); `merges` ships as an `array<string>` literal. */
  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column,
            merges: Seq[String]): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("bpe_encode", text,
      org.apache.spark.sql.functions.lit(merges.toArray))
  }
}
