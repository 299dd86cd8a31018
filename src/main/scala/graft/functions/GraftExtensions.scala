package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point registering graft's native
  * expressions as SQL functions, e.g.
  * `SELECT minhash_sig(sh, 16) FROM shingles`.
  *
  * Use at session build time:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)          // programmatic
  *   // or: .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  * or on a live session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def minhashSigBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(sh) => MinHashSignature(sh, 16)
    case Seq(sh, Literal(n: Int, _)) => MinHashSignature(sh, n)
    case _ => throw new IllegalArgumentException(
      "minhash_sig(array<long>[, numHashes: int literal])")
  }

  private def vecDotBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(u, v) => DotProduct(u, v)
    case _ => throw new IllegalArgumentException(
      "vec_dot(array<tinyint|smallint|int|float|double>, " +
        "array<tinyint|smallint|int|float|double>)")
  }

  private def simhash64Builder(args: Seq[Expression]): Expression = args match {
    case Seq(th) => SimHash64(th)
    case _ => throw new IllegalArgumentException("simhash64(array<long>)")
  }

  private def shingleHashesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(tokens, Literal(k: Int, _)) => ShingleHashes(tokens, k)
    case _ => throw new IllegalArgumentException(
      "shingle_hashes(array<string>, k: int literal)")
  }

  private def bloomContainsBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(h, bits, Literal(k: Int, _)) if bits.foldable =>
      BloomContains(h, bits, k)
    case _ => throw new IllegalArgumentException(
      "bloom_contains(hash: bigint, bits: array<bigint> literal, k: int literal)")
  }

  private def deflateLenBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text) => DeflateLen(text)
    case _ => throw new IllegalArgumentException("deflate_len(string)")
  }

  private def imageDHashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(payload) => ImageDHash(payload)
    case _ => throw new IllegalArgumentException("image_dhash(binary)")
  }

  private def audioFpBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(payload) => AudioFingerprint(payload)
    case _ => throw new IllegalArgumentException("audio_fp(binary)")
  }

  private def charGramHashesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text, Literal(n: Int, _)) => CharGramHashes(text, n)
    case _ => throw new IllegalArgumentException(
      "char_gram_hashes(string, n: int literal)")
  }

  private def videoDHashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(payload, Literal(stride: Int, _)) => VideoDHash(payload, stride)
    case _ => throw new IllegalArgumentException(
      "video_dhash(binary, stride: int literal)")
  }

  private def videoFrameDHashesBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(payload, Literal(stride: Int, _)) => VideoFrameDHashes(payload, stride)
    case _ => throw new IllegalArgumentException(
      "video_frame_dhashes(binary, stride: int literal)")
  }

  private def normalizeTextBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text, Literal(f: org.apache.spark.unsafe.types.UTF8String, _)) =>
      NormalizeText(text, f.toString)
    case _ => throw new IllegalArgumentException(
      "normalize_text(string, form: 'NFC'|'NFD'|'NFKC'|'NFKD' literal)")
  }

  private def bpeEncodeBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text, merges) if merges.foldable => BpeEncode(text, merges)
    case _ => throw new IllegalArgumentException(
      "bpe_encode(string, merges: array<string> literal)")
  }

  private def minWindowHashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text) => MinWindowHash(text, 8)
    case Seq(text, Literal(k: Int, _)) => MinWindowHash(text, k)
    case _ => throw new IllegalArgumentException(
      "min_window_hash(string[, k: int literal])")
  }

  private def charWindowPolyHashesBuilder(args: Seq[Expression]): Expression =
    args match {
      case Seq(text, Literal(k: Int, _)) => CharWindowPolyHashes(text, k)
      case _ => throw new IllegalArgumentException(
        "char_window_polyhashes(string, k: int literal)")
    }

  private def sortedIntersectCountBuilder(args: Seq[Expression]): Expression =
    args match {
      case Seq(a, b) => SortedIntersectCount(a, b)
      case _ => throw new IllegalArgumentException(
        "sorted_intersect_count(array<bigint>, array<bigint>) — both sorted" +
          " ascending, distinct")
    }

  private def polyHashBuilder(args: Seq[Expression]): Expression = args match {
    case Seq(text) => PolyHash(text, 31)
    case Seq(text, Literal(base: Int, _)) => PolyHash(text, base)
    case _ => throw new IllegalArgumentException(
      "poly_hash(string[, base: int literal])")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("minhash_sig"),
        new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
        minhashSigBuilder _),
      (FunctionIdentifier("vec_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
        vecDotBuilder _),
      (FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
        simhash64Builder _),
      (FunctionIdentifier("shingle_hashes"),
        new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
        shingleHashesBuilder _),
      (FunctionIdentifier("min_window_hash"),
        new ExpressionInfo(classOf[MinWindowHash].getName, "min_window_hash"),
        minWindowHashBuilder _),
      (FunctionIdentifier("char_window_polyhashes"),
        new ExpressionInfo(classOf[CharWindowPolyHashes].getName,
          "char_window_polyhashes"),
        charWindowPolyHashesBuilder _),
      (FunctionIdentifier("poly_hash"),
        new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
        polyHashBuilder _),
      (FunctionIdentifier("sorted_intersect_count"),
        new ExpressionInfo(classOf[SortedIntersectCount].getName,
          "sorted_intersect_count"),
        sortedIntersectCountBuilder _),
      (FunctionIdentifier("bloom_contains"),
        new ExpressionInfo(classOf[BloomContains].getName, "bloom_contains"),
        bloomContainsBuilder _),
      (FunctionIdentifier("deflate_len"),
        new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
        deflateLenBuilder _),
      (FunctionIdentifier("image_dhash"),
        new ExpressionInfo(classOf[ImageDHash].getName, "image_dhash"),
        imageDHashBuilder _),
      (FunctionIdentifier("audio_fp"),
        new ExpressionInfo(classOf[AudioFingerprint].getName, "audio_fp"),
        audioFpBuilder _),
      (FunctionIdentifier("video_dhash"),
        new ExpressionInfo(classOf[VideoDHash].getName, "video_dhash"),
        videoDHashBuilder _),
      (FunctionIdentifier("video_frame_dhashes"),
        new ExpressionInfo(classOf[VideoFrameDHashes].getName, "video_frame_dhashes"),
        videoFrameDHashesBuilder _),
      (FunctionIdentifier("char_gram_hashes"),
        new ExpressionInfo(classOf[CharGramHashes].getName, "char_gram_hashes"),
        charGramHashesBuilder _),
      (FunctionIdentifier("bpe_encode"),
        new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
        bpeEncodeBuilder _),
      (FunctionIdentifier("normalize_text"),
        new ExpressionInfo(classOf[NormalizeText].getName, "normalize_text"),
        normalizeTextBuilder _))

  /** Register on an already-built session (e.g. the shared test session). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    functions.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
