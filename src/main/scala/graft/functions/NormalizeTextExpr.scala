package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: `normalize_text(text, 'NFC'|'NFD'|'NFKC'|
  * 'NFKD')` — Unicode normalization (UAX #15). The quiet prerequisite of
  * every text-dedup operator here: "café" composed (U+00E9) and decomposed
  * (e + U+0301) are DIFFERENT strings to every hash in this library, so
  * unnormalized corpora leak near-duplicates past exact, MinHash, SimHash
  * and n-gram dedup alike; NFKC additionally folds compatibility forms
  * (ﬁ → fi, ｆｕｌｌｗｉｄｔｈ → fullwidth, ² → 2) that spam uses to
  * evade token-level filters. Normalize once at ingest, before hashing.
  *
  * The form is part of the expression (a literal, resolved at plan time,
  * never per row); eval and whole-stage codegen share one static method on
  * the pre-resolved `Normalizer.Form`. Like every native here the JVM's
  * ICU-equivalent implementation defines the semantics — the q85 oracle
  * pins NFC against DuckDB's independent `nfc_normalize` implementation,
  * the two agreeing BECAUSE Unicode normalization is a standard, which is
  * exactly the portability argument for normalizing before hashing.
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if NormalizeText.forms.contains(form) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"normalize_text form must be one of ${NormalizeText.forms.keys.mkString("/")}, got '$form'")
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  @transient private lazy val nf: Normalizer.Form =
    NormalizeText.forms(form)

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String], nf)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("nfForm", nf,
      classOf[Normalizer.Form].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NormalizeText.normalize($c, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {

  val forms: Map[String, Normalizer.Form] = Map(
    "NFC" -> Normalizer.Form.NFC, "NFD" -> Normalizer.Form.NFD,
    "NFKC" -> Normalizer.Form.NFKC, "NFKD" -> Normalizer.Form.NFKD)

  /** Static codegen entry point (also the interpreted eval body). Already-
    * normalized ASCII fast-path: `Normalizer.isNormalized` is a cheap scan
    * and the overwhelmingly common case in web corpora, skipping the
    * allocate-and-rebuild for text that needs nothing. */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** Column-API entry point (register-and-call, same pattern as
    * [[DeflateLen]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            text: org.apache.spark.sql.Column,
            form: String): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("normalize_text", text,
      org.apache.spark.sql.functions.lit(form))
  }
}
