package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression: `image_dhash(payload)` — the 64-bit
  * difference hash (dHash, the standard perceptual-hash family member used
  * for image near-dup screening) of a Netpbm P6 (PPM) payload.
  *
  * dHash recipe (public scheme, e.g. Krawetz's "Kind of Like That"
  * write-up): nearest-neighbor-sample the image to a 9-column × 8-row
  * grayscale grid, then set bit `ty·8 + tx` iff `gray(tx) < gray(tx+1)` on
  * row ty — 8 horizontal gradient signs per row, 64 bits total. Gradient
  * SIGNS survive re-encoding, brightness shifts and mild noise, which is
  * exactly what makes the hash perceptual: near-identical images land
  * within a small Hamming radius and can be bucket-joined with the same
  * 4×16-bit chunk machinery text SimHash uses
  * ([[graft.dedup.SimHash.nearDuplicatesFromSignatures]]).
  *
  * Why native: the whole decode→resize→hash runs per row inside whole-stage
  * codegen (the loop body is one static call — same pattern as
  * [[DeflateLen]]); only O(9·8) pixels of each payload are touched after
  * the O(1) header parse, so hashing cost is independent of image size.
  * The sampling grid reuses [[graft.multimodal.Multimodal.resizePpm]]'s
  * index map (`sy = ty·h div 8`, `sx = tx·w div 9`) and the P6 parse is the
  * same header walker as every other PPM stage — one parser, every stage.
  */
case class ImageDHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"image_dhash requires binary, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "image_dhash"

  override def nullSafeEval(input: Any): Any =
    ImageDHash.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ImageDHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDHash {

  /** Grid: 8 rows × 9 sampled columns → 8 gradient signs per row = 64 bits. */
  private val Rows = 8
  private val Cols = 9

  /** Static codegen entry point (also the interpreted eval body). Malformed
    * payloads fail loudly via the shared P6 parser — corrupt media should
    * surface, not hash to garbage. That contract includes sample width:
    * a maxval above 255 means 2-byte samples, and reading its plane as
    * 1-byte pixels would hash interleaved high/low bytes into a
    * meaningless (and silently wrong) signature. */
  def compute(b: Array[Byte]): Long = {
    val (w, h, maxval, pos) = graft.multimodal.Multimodal.parsePpmHeader(-1L, b)
    require(maxval <= 255,
      s"image_dhash supports 1-byte samples only, got maxval=$maxval")
    hashPlane(b, w, h, pos)
  }

  /** The grid hash over an ALREADY-LOCATED w×h RGB plane at byte `pos` —
    * split out so [[VideoDHash]] can hash each sampled frame of a
    * concatenated-P6 stream IN PLACE (no per-frame payload copy). */
  def hashPlane(b: Array[Byte], w: Int, h: Int, pos: Int): Long = {
    var hash = 0L
    var ty = 0
    while (ty < Rows) {
      // Long intermediates: header-legal dims reach 2^20 (see resizePpm)
      val sy = (ty.toLong * h / Rows).toInt
      var prev = 0
      var tx = 0
      while (tx < Cols) {
        val sx = (tx.toLong * w / Cols).toInt
        val base = pos + 3 * (sy * w + sx)
        val g = ((b(base) & 0xff) + (b(base + 1) & 0xff) +
          (b(base + 2) & 0xff)) / 3
        if (tx > 0 && prev < g) hash |= 1L << (ty * Rows + (tx - 1))
        prev = g
        tx += 1
      }
      ty += 1
    }
    hash
  }

  /** Column-API entry point (register-and-call, same pattern as
    * [[DeflateLen]]). */
  def apply(spark: org.apache.spark.sql.SparkSession,
            payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    GraftExtensions.register(spark)
    org.apache.spark.sql.functions.call_function("image_dhash", payload)
  }
}
