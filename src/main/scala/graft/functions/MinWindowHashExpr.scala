package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: minimum base-31 mod-(1e9+7) polynomial hash
  * over all k-character windows of a string — the winnowing-style document
  * fingerprint (robust to local edits, used as a cheap near-dup prefilter).
  *
  * `min_window_hash(text, k) = min_i P(text[i..i+k-1])` where
  * `P(s) = fold(a = 0; a = (a*31 + codepoint) mod 1e9+7)` — the SAME
  * recurrence as [[graft.textstats.TextStats.fingerprint]] (q25), so a SQL
  * engine can replay it window-by-window and the q31 driver row gets an
  * exact oracle. Strings shorter than k collapse to the whole-string hash
  * P(text); the empty string hashes to 0 (the fold seed).
  *
  * Why native: each window hash derives from its predecessor in O(1) via
  * `h' = ((h − c_out·31^(k−1))·31 + c_in) mod p`, so the whole document is
  * one O(len) primitive loop. The HOF formulation it replaces
  * (`transform(sequence(...), i => xxhash64(substring(text, i, k)))`)
  * allocated a k-char substring and ran an interpreted lambda per window —
  * O(len·k) work and len boxed allocations per row — and its xxhash64 family
  * had no SQL-engine twin, forcing the driver row down to rows-only.
  */
case class MinWindowHash(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1 && k <= 1024, "window width k must be in [1, 1024]")

  private val M = 1000000007L
  /** 31^(k-1) mod M — the rolling subtract coefficient. */
  private val bk1: Long = {
    var r = 1L; var i = 0
    while (i < k - 1) { r = r * 31L % M; i += 1 }
    r
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"min_window_hash requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "min_window_hash"

  override def nullSafeEval(input: Any): Any = {
    // Codepoint iteration matches `ascii(char)` on both Spark and DuckDB
    // (each yields the character's codepoint), keeping the oracle exact
    // beyond ASCII. One String materialization per row, then O(len) work.
    val s = input.asInstanceOf[UTF8String].toString
    val buf = new Array[Int](k) // circular buffer of the window's codepoints
    var h = 0L
    var min = Long.MaxValue
    var cnt = 0
    var idx = 0
    while (idx < s.length) {
      val cp = s.codePointAt(idx)
      idx += Character.charCount(cp)
      if (cnt >= k) {
        // buf(cnt % k) holds the codepoint that entered k steps ago
        val out = buf(cnt % k)
        h = ((h - out * bk1 % M + M) % M * 31L + cp) % M
      } else {
        h = (h * 31L + cp) % M
      }
      buf(cnt % k) = cp
      cnt += 1
      if (cnt >= k && h < min) min = h
    }
    if (cnt < k) h else min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      val buf = ctx.freshName("buf")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val cnt = ctx.freshName("cnt")
      val idx = ctx.freshName("idx")
      val cp = ctx.freshName("cp")
      val out = ctx.freshName("out")
      s"""
         |String $s = $c.toString();
         |int[] $buf = new int[$k];
         |long $h = 0L;
         |long $min = Long.MAX_VALUE;
         |int $cnt = 0;
         |int $idx = 0;
         |while ($idx < $s.length()) {
         |  int $cp = $s.codePointAt($idx);
         |  $idx += Character.charCount($cp);
         |  if ($cnt >= $k) {
         |    int $out = $buf[$cnt % $k];
         |    $h = (($h - $out * ${bk1}L % ${M}L + ${M}L) % ${M}L * 31L + $cp) % ${M}L;
         |  } else {
         |    $h = ($h * 31L + $cp) % ${M}L;
         |  }
         |  $buf[$cnt % $k] = $cp;
         |  $cnt++;
         |  if ($cnt >= $k && $h < $min) $min = $h;
         |}
         |${ev.value} = ($cnt < $k) ? $h : $min;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinWindowHash {
  /** Column-API entry point (register-and-call, same pattern as
    * [[ShingleHashes]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("min_window_hash", text,
      org.apache.spark.sql.functions.lit(k))
  }
}
