package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap: split each document into
  * `chunkChars`-character windows advancing `strideChars` per chunk — the
  * standard context-window preparation for embedding models and retrieval
  * corpora (stride < chunk ⇒ consecutive chunks overlap by
  * `chunkChars - strideChars` characters so no span is lost at a boundary).
  *
  * Chunk starts are `0, stride, 2·stride, …` up to the LAST start that
  * still begins new content (`start < len`, and a final short window is
  * emitted rather than dropped — training corpora must not silently lose
  * document tails). Empty documents emit one empty chunk, keeping the
  * doc_id set stable through the operator (the same shape contract as the
  * shingle expressions).
  *
  * Scale shape: pure per-row codegen — `posexplode(sequence(...))` over
  * start offsets, then one `substr` per chunk. No shuffle at all: chunk
  * rows inherit the scan's partitioning, and downstream tokenize/embed
  * stages consume them in place. Work per document is
  * O(len · chunk/stride) characters copied — a fixed small multiple of the
  * input for any sane overlap (stride ≥ chunk/2 ⇒ ≤ 2× inflation), NOT
  * quadratic: chunk length is a constant, only the number of windows grows
  * with the document.
  */
object Chunking {

  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkChars: Int, strideChars: Int): DataFrame = {
    require(chunkChars >= 1, s"chunkChars must be >= 1, got $chunkChars")
    require(strideChars >= 1 && strideChars <= chunkChars,
      s"need 1 <= strideChars <= chunkChars, got $strideChars/$chunkChars")
    // last start strictly below len (0 for the empty doc), in stride steps;
    // integer arithmetic throughout: (len-1) div stride · stride
    val lastStart = greatest(lit(0),
      expr(s"(length($textCol) - 1) div $strideChars").cast("int")
        * strideChars)
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        posexplode(sequence(lit(0), lastStart, lit(strideChars)))
          .as(Seq("chunk_idx", "chunk_start")))
      .withColumn("chunk_text", // substr is 1-based; clamps at the tail
        col("__t").substr(col("chunk_start") + 1, lit(chunkChars)))
      .withColumn("n_chunk_chars", length(col("chunk_text")))
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_text",
        "n_chunk_chars")
  }

  /** Content-defined chunking (CDC) — boundaries chosen by the CONTENT,
    * not by fixed offsets: a chunk ends wherever the rolling `w`-char
    * polynomial hash satisfies `h mod 2^maskBits = 0` (plus a final
    * boundary at the document end). The Rabin/Gear trick from dedup
    * storage (LBFS, Muthitacharoen et al. 2001), applied to text: after a
    * local edit, boundaries RE-SYNCHRONIZE at the next content match, so
    * all later chunks keep their identity — fixed-window chunking shifts
    * every downstream chunk and defeats chunk-level dedup. Expected chunk
    * length is 2^maskBits chars; documents shorter than `w` are one
    * chunk.
    *
    * Output (doc_id, chunk_idx, start, chunk_len, chunk_hash): start
    * 1-based inclusive, chunk_hash the q25 polynomial of the chunk text —
    * join chunk_hash across docs for chunk-level dedup/delta. EXACT
    * cross-engine: window hashes come from the native rolling
    * [[graft.functions.CharWindowPolyHashes]] (one O(len) loop per doc),
    * whose q25 recurrence a SQL oracle replays window-by-window; the
    * segmentation and chunk hashes are deterministic functions of them.
    *
    * Scale shape: pure per-row codegen + in-row HOFs — zero shuffles;
    * chunk rows inherit the scan's partitioning (the [[chunkDocs]]
    * contract). Chunk hashes are computed IN-ROW (the whole (start, end,
    * hash) struct array is built before the explode) so the document
    * text never rides the Generate — the earlier formulation carried
    * `__t` through `posexplode` and hashed after, which copied the FULL
    * document into every chunk row (O(len²/chunkLen) bytes per doc) and
    * paid the interpreted `aggregate(split(…))` per-character-allocation
    * fold per chunk; the hash is now the native scalar
    * [[graft.functions.PolyHash]] (same q25 recurrence, one primitive
    * O(len) loop per chunk, value-identical to the oracle's
    * list_reduce). */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                w: Int = 16, maskBits: Int = 6): DataFrame = {
    require(w >= 2 && w <= 1024, s"window width w must be in [2, 1024], got $w")
    require(maskBits >= 1 && maskBits <= 20,
      s"maskBits must be in [1, 20], got $maskBits")
    val spark = docs.sparkSession
    graft.functions.GraftExtensions.register(spark)
    val mask = 1L << maskBits
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("__t"),
        length(col(textCol)).as("__len"),
        graft.functions.CharWindowPolyHashes(spark, col(textCol), w)
          .as("__hs"))
      // boundary ends: window ending at j + w (0-based j into __hs) where
      // the hash meets the mask; short docs take no content boundaries
      .withColumn("__ends0", expr(
        s"CASE WHEN __len < $w THEN CAST(array() AS array<int>) ELSE " +
          s"transform(filter(sequence(0, size(__hs) - 1), " +
          s"j -> __hs[j] % $mask = 0), j -> CAST(j + $w AS INT)) END"))
      // the document end is always a boundary (emitted once)
      .withColumn("__ends", expr(
        "CASE WHEN size(__ends0) > 0 AND element_at(__ends0, -1) = __len " +
          "THEN __ends0 ELSE concat(__ends0, array(CAST(__len AS INT))) END"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(__ends) - 1), k -> struct(" +
          "CAST(CASE WHEN k = 0 THEN 1 ELSE element_at(__ends, k) + 1 END " +
          "AS INT) AS s, " +
          "CAST(element_at(__ends, k + 1) AS INT) AS e, " +
          "poly_hash(substring(__t, " +
          "CASE WHEN k = 0 THEN 1 ELSE element_at(__ends, k) + 1 END, " +
          "element_at(__ends, k + 1) - " +
          "CASE WHEN k = 0 THEN 1 ELSE element_at(__ends, k) + 1 END + 1)) " +
          "AS h))")))
      .select(col("doc_id"),
        (col("pos") + 1).cast("int").as("chunk_idx"),
        col("col.s").as("start"),
        (col("col.e") - col("col.s") + 1).cast("int").as("chunk_len"),
        col("col.h").as("chunk_hash"))
  }
}
