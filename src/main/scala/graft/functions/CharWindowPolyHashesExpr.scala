package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the base-31 mod-(1e9+7) polynomial hash of
  * EVERY k-character window of a string, as an array — the array-emitting
  * sibling of [[MinWindowHash]] (which folds the same stream to its
  * minimum). `char_window_polyhashes(text, k)[j] = P(text[j+1 .. j+k])`
  * (0-based j, 1-based char positions), with `P` the q25 fingerprint
  * recurrence `a = (a·31 + codepoint) mod 1e9+7` — so a SQL engine can
  * replay any consumer window-by-window and driver rows built on it get
  * exact oracles (unlike the XXH64 [[CharGramHashes]] family). Strings
  * shorter than k collapse to one whole-string hash; the empty string
  * hashes to [0] (the fold seed).
  *
  * Native because consumers (content-defined chunking) need every window
  * of every document: the rolling `h' = ((h − c_out·31^(k−1))·31 + c_in)
  * mod p` update makes the whole document one O(len) primitive loop,
  * where the `transform(sequence(...), i -> P(substr(text, i, k)))`
  * formulation is O(len·k) interpreted work with a substring allocation
  * per window. Codepoint iteration matches `ascii(char)` on both Spark
  * and DuckDB, keeping oracles exact beyond ASCII.
  */
case class CharWindowPolyHashes(child: Expression, k: Int)
  extends UnaryExpression {

  require(k >= 1 && k <= 1024, "window width k must be in [1, 1024]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_window_polyhashes requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_polyhashes"

  override def nullSafeEval(input: Any): Any =
    CharWindowPolyHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharWindowPolyHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharWindowPolyHashes {

  private val M = 1000000007L

  /** Static codegen entry point (also the interpreted eval body): decode
    * codepoints once, then one rolling O(len) pass. */
  def compute(s0: UTF8String, k: Int): GenericArrayData = {
    val s = s0.toString
    val cps = new Array[Int](s.length)
    var n = 0
    var idx = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      idx += Character.charCount(cp)
      cps(n) = cp
      n += 1
    }
    if (n >= k) {
      // 31^(k-1) mod M — the rolling subtract coefficient
      var bk1 = 1L
      var t = 0
      while (t < k - 1) { bk1 = bk1 * 31L % M; t += 1 }
      val out = new Array[Long](n - k + 1)
      var h = 0L
      var i = 0
      while (i < n) {
        if (i >= k)
          h = ((h - cps(i - k) * bk1 % M + M) % M * 31L + cps(i)) % M
        else
          h = (h * 31L + cps(i)) % M
        if (i >= k - 1) out(i - k + 1) = h
        i += 1
      }
      new GenericArrayData(out)
    } else {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * 31L + cps(i)) % M; i += 1 }
      new GenericArrayData(Array(h))
    }
  }

  /** Column-API entry point (register-and-call, same pattern as
    * [[ShingleHashes]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("char_window_polyhashes",
      text, org.apache.spark.sql.functions.lit(k))
  }
}

/** Native Catalyst expression: the whole-string q25 polynomial hash —
  * `poly_hash(text[, base]) = fold(a, cp → (a·base + cp) mod 1e9+7)` over
  * the string's codepoints (base 31 default; base 37 is the second
  * fingerprint channel), the scalar little sibling of
  * [[CharWindowPolyHashes]] (same recurrence, no windows). Exists because
  * the `aggregate(split(text, ''), …)` SQL formulation consumers used to
  * inline is an interpreted higher-order fold paying one single-character
  * UTF8String allocation per input character — this is one primitive
  * O(len) codegen loop. Values are IDENTICAL to the SQL fold on BMP text
  * (and to the DuckDB `list_reduce` oracles replaying it — beyond the BMP
  * the codepoint loop matches the oracle where the split fold would
  * diverge on surrogate halves): ExpressionSpec pins codegen ==
  * interpreted == the SQL aggregate at both bases. Empty string hashes
  * to 0 (the fold seed); null in, null out. */
case class PolyHash(child: Expression, base: Int) extends UnaryExpression {

  require(base >= 2 && base <= 1024, "poly_hash base must be in [2, 1024]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PolyHash.compute($c, $base);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PolyHash {

  private val M = 1000000007L

  /** Static codegen entry point (also the interpreted eval body). */
  def compute(s0: UTF8String, base: Int): Long = {
    val s = s0.toString
    var h = 0L
    var idx = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      idx += Character.charCount(cp)
      h = (h * base + cp) % M
    }
    h
  }

  /** Column-API entry point (register-and-call). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column,
            base: Int = 31): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("poly_hash", text,
      org.apache.spark.sql.functions.lit(base))
  }

  /** Session-FREE Column entry point: builds the Catalyst expression
    * directly, with no function-registry registration — for pure-Column
    * helpers ([[graft.textstats.TextStats.fingerprintBase]],
    * Dsir.bucketOf) that have no owning DataFrame in scope. The
    * register-and-call [[apply]] variant resolves through the thread's
    * session registry; in a multi-session JVM a column built under one
    * session but analyzed under another would fail to resolve
    * `poly_hash` — this constructor embeds the expression itself, so the
    * column is valid under any session. */
  def columnOf(text: org.apache.spark.sql.Column, base: Int = 31)
      : org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(PolyHash(GraftColumnBridge.expression(text), base))
  }
}
